package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.NearDup._

class NearDupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
  ).toDF("doc_id", "text")

  test("shingles: distinct lowercase word bigrams") {
    val sh = docs.where($"doc_id" === 1)
      .select(shingles(col("text"), 2).as("sh"))
      .as[Seq[String]].head()
    assert(sh.contains("the quick") && sh.contains("lazy dog"))
    assert(sh.length == 8) // 9 tokens -> 8 bigrams, all distinct
  }

  test("shingles: short text yields empty bigram set, not an error") {
    val sh = Seq((1L, "word")).toDF("id", "text")
      .select(shingles(col("text"), 2).as("sh")).as[Seq[String]].head()
    assert(sh.isEmpty)
  }

  test("minhash: identical texts have identical signatures") {
    val sigs = docs.where($"doc_id".isin(1, 4))
      .select(minhashSignature(hashedShingles(col("text"), 2), 8).as("sig"))
      .as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
  }

  test("nearDupPairs finds near and exact dups, not unrelated docs") {
    val pairs = nearDupPairs(docs, col("doc_id"), col("text"), n = 2, numHashes = 16, rowsPerBand = 1, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
  }

  test("jaccard of exact dup is 1.0") {
    val j = nearDupPairs(docs, col("doc_id"), col("text"), n = 2, numHashes = 16, rowsPerBand = 1, threshold = 0.5)
      .where($"id_a" === 1 && $"id_b" === 4)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("simhash: exact dups collide, near-dups are close, unrelated far") {
    val sims = docs.select($"doc_id", simhash(hashedShingles(col("text"), 2), 32).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(sims(1L) == sims(4L))
    val near = java.lang.Long.bitCount(sims(1L) ^ sims(2L))
    val far = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    assert(near < far)
  }

  test("simhashPairs respects the pigeonhole precondition") {
    intercept[IllegalArgumentException] {
      simhashPairs(docs, col("doc_id"), col("text"), 2, 32, numBands = 4, maxHamming = 5)
    }
  }

  test("incrementalNearDupPairs == the cross-split slice of the full " +
    "self-join pairs; existing/arriving pairs never formed internally") {
    val big = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 1
      (3L, "one two three four five six seven eight"),
      (10L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (11L, "one two three four five six seven nine"),        // near-dup of 3
      (12L, "totally unrelated content goes right here folks")
    ).toDF("doc_id", "text")
    val existing = big.where($"doc_id" < 10)
    val arriving = big.where($"doc_id" >= 10)
    val incr = incrementalNearDupPairs(existing, arriving,
        col("doc_id"), col("text"), n = 2, numHashes = 16, rowsPerBand = 1,
        threshold = 0.5)
      .select($"existing_id", $"arriving_id")
      .as[(Long, Long)].collect().toSet
    val full = nearDupPairs(big, col("doc_id"), col("text"),
        n = 2, numHashes = 16, rowsPerBand = 1, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .filter(p => p._1 < 10 && p._2 >= 10).toSet
    assert(incr == full)
    assert(incr.contains((1L, 10L)) && incr.contains((3L, 11L)))
    assert(!incr.exists { case (_, b) => b == 12L })
  }

  test("incrementalEmbeddingNearDupPairs: pairs are a subset of the exact " +
    "cross pairs; single-bucket ⊆ multi-probe; measured recall at sf0.01") {
    import graft.functions.{VectorExpressions, VectorFunctions}
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val matrix = VectorFunctions.projectionMatrix(4, 64, 42L)
    val existing = emb.where($"vec_id" < 400)
    val arriving = emb.where($"vec_id" >= 400)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"arriving_id", $"existing_id").as[(Long, Long)].collect().toSet
    val multi = pairSet(incrementalEmbeddingNearDupPairs(existing, arriving,
      col("vec_id"), col("embedding"), matrix, threshold = 0.6))
    val single = pairSet(incrementalEmbeddingNearDupPairs(existing, arriving,
      col("vec_id"), col("embedding"), matrix, threshold = 0.6,
      multiProbe = false))
    // exact ground truth: full cross join under the same rounded distance
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(VectorExpressions.dotProduct(c, c))
    val ex = existing.select($"vec_id".as("eid"), $"embedding".as("ev"))
    val ar = arriving.select($"vec_id".as("aid"), $"embedding".as("av"))
    val exact = ex.crossJoin(ar)
      .withColumn("distance", round(
        when(nrm($"ev") === 0.0d || nrm($"av") === 0.0d, lit(Double.PositiveInfinity))
          .otherwise(lit(1.0d) - VectorExpressions.dotProduct($"ev", $"av") /
            (nrm($"ev") * nrm($"av"))), 6) + lit(0.0d))
      .where($"distance" <= 0.6)
      .select($"aid", $"eid").as[(Long, Long)].collect().toSet
    assert(multi.subsetOf(exact), "blocked pairs must never invent a pair")
    assert(single.subsetOf(multi), "Hamming-1 probing only ADDS candidates")
    val recall = multi.size.toDouble / exact.size
    info(f"incremental embedding recall vs exact cross pairs: $recall%.3f " +
      s"(${multi.size}/${exact.size}; single-bucket ${single.size})")
    // P=4 Hamming-1 blocking on near-random synthetic vectors measured
    // 12/19 = 0.63 — the floor guards against silent probe regressions
    assert(recall >= 0.5, f"recall $recall%.3f < 0.5")
  }

  test("incrementalEmbeddingNearDupPairs == the cross-split slice of the " +
    "batch operator's pairs (same blocking, same confirm)") {
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val matrix = VectorFunctions.projectionMatrix(4, 64, 42L)
    val Split = 300L
    val incr = incrementalEmbeddingNearDupPairs(
        emb.where($"vec_id" < Split), emb.where($"vec_id" >= Split),
        col("vec_id"), col("embedding"), matrix, threshold = 0.6)
      .select($"existing_id", $"arriving_id")
      .as[(Long, Long)].collect().toSet
    // the batch operator on the WHOLE table, restricted to cross-split
    // pairs: both block on hamming(bucket) <= 1 and confirm with the same
    // rounded cosine, so the slices must agree exactly
    val full = embeddingNearDupPairs(emb, col("vec_id"), col("embedding"),
        matrix, threshold = 0.6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
      .filter(p => p._1 < Split && p._2 >= Split).toSet
    assert(incr == full)
    assert(incr.nonEmpty, "trivially-empty slice would prove nothing")
  }

  test("incrementalEmbeddingNearDupPairs: a stored bucket column is " +
    "trusted verbatim and an identical arriving vector is always found") {
    import graft.functions.{VectorExpressions, VectorFunctions}
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val matrix = VectorFunctions.projectionMatrix(4, 64, 42L)
    val existing = emb.where($"vec_id" < 400)
      .withColumn("bucket", VectorExpressions.lshBucket($"embedding", matrix))
      .localCheckpoint() // the persisted-index shape: bucket stored in-row
    // arriving batch = exact copies of three existing vectors, new ids
    val arriving = emb.where($"vec_id".isin(5L, 17L, 123L))
      .select(($"vec_id" + 10000L).as("vec_id"), $"embedding")
    val got = incrementalEmbeddingNearDupPairs(existing, arriving,
        col("vec_id"), col("embedding"), matrix, threshold = 0.0,
        existingBucket = Some(col("bucket")))
      .select($"arriving_id", $"existing_id", $"distance")
      .as[(Long, Long, Double)].collect()
    // identical vector => identical bucket => found at distance 0.0
    val found = got.map(r => (r._1, r._2)).toSet
    assert(Set((10005L, 5L), (10017L, 17L), (10123L, 123L)).subsetOf(found))
    assert(got.filter(r => r._2 == r._1 - 10000L).forall(_._3 == 0.0d))
  }

  test("two too-short documents (empty shingle sets) are NOT confirmed " +
    "dups: jaccard of empty sets is 0.0, never NaN") {
    val short = Seq(
      (1L, "a b"),                                    // < 3 tokens: no trigrams
      (2L, "x y"),                                    // < 3 tokens, unrelated
      (3L, "one two three four five six seven eight"),
      (4L, "one two three four five six seven eight")
    ).toDF("doc_id", "text")
    val j = short.where($"doc_id" <= 2)
      .agg(first(jaccard(hashedShingles(col("text"), 3),
        hashedShingles(col("text"), 3)))).head().getDouble(0)
    assert(j == 0.0) // empty vs empty: 0.0, not NaN
    val pairs = nearDupPairs(short, col("doc_id"), col("text"),
        n = 3, numHashes = 16, rowsPerBand = 1, threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L))) // 1-2 (both empty) never pair
    val incr = incrementalNearDupPairs(
        short.where($"doc_id" === 1), short.where($"doc_id" === 2),
        col("doc_id"), col("text"), n = 3, rowsPerBand = 1, threshold = 0.5)
    assert(incr.count() == 0)
  }

  test("exact-duplicate collapse: a 5k-copy group yields O(distinct)-" +
    "bounded banded candidates and O(m) edges, never O(m^2)") {
    val m = 5000
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = ((1 to m).map(i => (i.toLong, dupText)) ++ Seq(
      (9001L, "alpha beta gamma delta epsilon zeta eta iota"), // near-dup of the group
      (9002L, "one two three four five six seven eight"),
      (9003L, "totally unrelated content goes right here folks")
    )).toDF("doc_id", "text")
    // the banded join runs over DISTINCT texts: 4 reps -> at most C(4,2)
    // candidates regardless of m (pre-collapse this was >= C(5000,2))
    val (members, reps) = collapseByDigest(corpus, col("doc_id"), col("text"))
    assert(members.count() == m + 3 && reps.count() == 4)
    val sig = reps.select(col("grp").as("id"),
      minhashSignature(hashedShingles(col("text"), 3), 16).as("sig"))
    assert(bandedCandidates(sig, "id", "sig", 2).count() <= 6)
    // edge set: m-1 star edges for the group + rep-level confirmed pairs
    val edges = nearDupEdges(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
    val cnt = edges.count()
    assert(cnt >= m - 1 && cnt <= m + 5, s"edge count $cnt is not O(m)")
    // the group's star edges all hang off the min id
    assert(edges.where($"id_b" <= m).where($"id_a" =!= 1L).count() == 0)
  }

  test("nearDupEdges preserves the greedy drop relation and the " +
    "components of the full pair graph (interleaved ids across groups)") {
    // ids deliberately interleaved so group mins differ from global order:
    // group A = {5, 6}, group B = {2} (near-dup of A), group C = {1, 3},
    // isolated 9 — the full graph drops 6 (via 5), 5 (via 2), 3 (via 1)
    val corpus = Seq(
      (5L, "alpha beta gamma delta epsilon zeta eta theta"),
      (6L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),
      (1L, "one two three four five six seven eight"),
      (3L, "one two three four five six seven eight"),
      (9L, "totally unrelated content goes right here folks")
    ).toDF("doc_id", "text")
    def run(f: => org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      f.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val pairs = run(nearDupPairs(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 1, threshold = 0.5))
    val edges = run(nearDupEdges(corpus, col("doc_id"), col("text"),
      n = 3, numHashes = 16, rowsPerBand = 1, threshold = 0.5))
    assert(pairs == Set((5L, 6L), (2L, 5L), (2L, 6L), (1L, 3L)))
    assert(edges.subsetOf(pairs), "edges must be a subset of the pairs")
    // identical greedy losers (drop b iff some a < b pairs with it)
    assert(pairs.map(_._2) == edges.map(_._2))
    // identical transitive closure (brute-force union-find)
    def comps(es: Set[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      Seq(1L, 2L, 3L, 5L, 6L, 9L).foreach(find)
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(ra max rb) = ra min rb
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    assert(comps(pairs) == comps(edges))
  }

  test("collapsed nearDupPairs equals brute-force all-pairs jaccard on a " +
    "duplicate-heavy corpus (exact values, empties excluded)") {
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "alpha beta gamma delta epsilon zeta eta iota",
      "one two three four five six seven eight",
      "a b" // empty trigram set
    )
    // 20 copies of text 0, 3 of text 1, 2 each of texts 2-3
    val corpus = (
      (1 to 20).map(i => (i.toLong, texts(0))) ++
      (21 to 23).map(i => (i.toLong, texts(1))) ++
      Seq((24L, texts(2)), (25L, texts(2)), (26L, texts(3)), (27L, texts(3)))
    ).toDF("doc_id", "text")
    val got = nearDupPairs(corpus, col("doc_id"), col("text"),
        n = 3, numHashes = 16, rowsPerBand = 1, threshold = 0.5)
      .select($"id_a", $"id_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val h = corpus.select($"doc_id", hashedShingles(col("text"), 3).as("hsh"))
    val brute = h.as("x").join(h.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id",
        jaccard($"x.hsh", $"y.hsh").as("j"))
      .where($"j" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    assert(got.exists { case (a, b, j) => a <= 20 && b <= 20 && j == 1.0 })
    assert(!got.exists { case (_, b, _) => b >= 26 }, "empty sets never pair")
  }

  test("collapsed simhashPairs equals brute-force all-pairs hamming on a " +
    "duplicate-heavy corpus") {
    val corpus = (
      (1 to 15).map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta")) ++
      Seq((21L, "alpha beta gamma delta epsilon zeta eta iota"),
          (22L, "one two three four five six seven eight"),
          (23L, "one two three four five six seven eight"))
    ).toDF("doc_id", "text")
    val got = simhashPairs(corpus, col("doc_id"), col("text"),
        shingleN = 2, bits = 48, numBands = 6, maxHamming = 5)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    val h = corpus.select($"doc_id",
      simhash(hashedShingles(col("text"), 2), 48).as("sim"))
    val brute = h.as("x").join(h.as("y"), $"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id",
        hamming($"x.sim", $"y.sim").cast("int").as("hm"))
      .where($"hm" <= 5)
      .as[(Long, Long, Int)].collect().toSet
    // brute force is lossless; banding is pigeonhole-lossless at <= 5 bits
    assert(got == brute)
    assert(got.exists { case (a, b, hm) => a <= 15 && b <= 15 && hm == 0 })
  }

  test("collapsed embeddingNearDupPairs equals the blocking contract " +
    "(bucket hamming <= 1, rounded cosine) on duplicated vectors") {
    import graft.functions.{VectorExpressions, VectorFunctions}
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .where($"vec_id" < 200)
    // plant exact duplicates: 5 copies of vector 0, 3 of vector 7
    val dups = emb.where($"vec_id" === 0)
      .crossJoin(spark.range(1, 6).select(($"id" + 1000L).as("nid")))
      .select($"nid".as("vec_id"), $"embedding")
      .unionByName(emb.where($"vec_id" === 7)
        .crossJoin(spark.range(1, 4).select(($"id" + 2000L).as("nid")))
        .select($"nid".as("vec_id"), $"embedding"))
    val corpus = emb.select($"vec_id", $"embedding").unionByName(dups)
    val matrix = VectorFunctions.projectionMatrix(4, 64, 42L)
    val got = embeddingNearDupPairs(corpus, col("vec_id"), col("embedding"),
        matrix, threshold = 0.6)
      .select($"id_a", $"id_b", $"distance")
      .as[(Long, Long, Double)].collect().toSet
    // the contract, brute-forced: every pair whose buckets differ in at
    // most one projection sign and whose ROUNDED cosine clears 0.6
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(VectorExpressions.dotProduct(c, c))
    val w = corpus.select($"vec_id".as("id"), $"embedding".as("e"),
      VectorExpressions.lshBucket($"embedding", matrix).as("b"))
    val brute = w.as("x").join(w.as("y"), $"x.id" < $"y.id" &&
        bit_count($"x.b".bitwiseXOR($"y.b")) <= 1)
      .withColumn("distance", round(
        when(nrm($"x.e") === 0.0d || nrm($"y.e") === 0.0d,
          lit(Double.PositiveInfinity))
        .otherwise(lit(1.0d) - VectorExpressions.dotProduct($"x.e", $"y.e") /
          (nrm($"x.e") * nrm($"y.e"))), 6) + lit(0.0d))
      .where($"distance" <= 0.6)
      .select($"x.id", $"y.id", $"distance")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    // the planted copies pair with their original at exactly 0.0
    assert(got.exists { case (a, b, d) => a == 0L && b == 1001L && d == 0.0 })
  }

  test("incremental variants collapse a duplicate-heavy ARRIVING batch: " +
    "every copy is still reported against its existing match") {
    // text: 200 identical arriving copies of a near-dup of doc 1 + 1 novel
    val existing = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val arriving = ((100 to 299).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta eta iota")) :+
      (300L, "totally unrelated content goes right here folks"))
      .toDF("doc_id", "text")
    val got = incrementalNearDupPairs(existing, arriving,
        col("doc_id"), col("text"), n = 3, numHashes = 16, rowsPerBand = 2,
        threshold = 0.5)
      .select($"arriving_id", $"existing_id", $"jaccard")
      .as[(Long, Long, Double)].collect()
    // all 200 copies match doc 1 at the SAME jaccard (5 shared of 7
    // distinct trigrams); the novel doc matches nothing
    assert(got.length == 200)
    assert(got.forall { case (a, e, j) =>
      a >= 100 && a <= 299 && e == 1L && j == got.head._3 })
    assert(!got.exists(_._1 == 300L))
    // embeddings: 150 identical arriving copies of an existing vector
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val matrix = VectorFunctions.projectionMatrix(4, 64, 42L)
    val ex = emb.where($"vec_id" < 300)
    val arrEmb = emb.where($"vec_id" === 5)
      .crossJoin(spark.range(150).select(($"id" + 5000L).as("nid")))
      .select($"nid".as("vec_id"), $"embedding")
    val gotEmb = incrementalEmbeddingNearDupPairs(ex, arrEmb,
        col("vec_id"), col("embedding"), matrix, threshold = 0.0)
      .select($"arriving_id", $"existing_id", $"distance")
      .as[(Long, Long, Double)].collect()
    // every copy finds vector 5 at exactly 0.0 (plus any other existing
    // vector at rounded distance 0.0, identically for every copy)
    val perArrival = gotEmb.groupBy(_._1).view.mapValues(
      _.map(r => (r._2, r._3)).toSet).toMap
    assert(perArrival.keySet == (5000L until 5150L).toSet)
    assert(perArrival.values.toSet.size == 1, "copies must match identically")
    assert(perArrival(5000L).contains((5L, 0.0)))
  }

  test("sourceOverlap: identical corpora estimate 1.0, disjoint estimate " +
    "0.0, and the estimate tracks exact Jaccard within MinHash variance") {
    val corpus = Seq(
      // a and b are byte-identical corpora; c shares nothing with them
      ("a", 1L, "alpha beta gamma delta epsilon zeta"),
      ("a", 2L, "eta theta iota kappa lambda mu"),
      ("b", 3L, "alpha beta gamma delta epsilon zeta"),
      ("b", 4L, "eta theta iota kappa lambda mu"),
      ("c", 5L, "nu xi omicron pi rho sigma tau")
    ).toDF("source", "doc_id", "text")
    val got = graft.operators.NearDup.sourceOverlap(corpus, col("source"),
        col("text"), n = 3, numHashes = 16)
      .select("grp_a", "grp_b", "est_jaccard")
      .as[(String, String, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    assert(got(("a", "b")) == 1.0d)
    assert(got(("a", "c")) == 0.0d && got(("b", "c")) == 0.0d)
    // estimator quality on the driver corpus: mean |est - exact| over all
    // source pairs stays within the H=16 MinHash standard error (~0.125)
    val docs001 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val est = graft.operators.NearDup.sourceOverlap(docs001, col("source"),
        col("text"), n = 3, numHashes = 16)
      .select("grp_a", "grp_b", "est_jaccard")
      .as[(String, String, Double)].collect()
      .map { case (a, b, e) => (a, b) -> e }.toMap
    val sets = docs001
      .select(col("source"),
        explode(hashedShingles(col("text"), 3)).as("h"))
      .as[(String, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val errs = est.map { case ((a, b), e) =>
      val exact = sets(a).intersect(sets(b)).size.toDouble /
        sets(a).union(sets(b)).size
      math.abs(e - exact)
    }
    assert(errs.sum / errs.size <= 0.125,
      s"mean estimator error ${errs.sum / errs.size}")
  }

  test("containmentPairs: a short document QUOTED inside a long one is " +
    "found at containment 1.0 in that direction only — the case whose " +
    "Jaccard is far below any near-dup threshold; prefix filtering is " +
    "exact against a brute-force recomputation; no cartesian product") {
    val quote = "the five boxing wizards jump quickly over the lazy dog tonight"
    val host = ("completely different framing text around a citation " +
      s"$quote and then a long unrelated tail " +
      (1 to 60).map(i => s"filler$i").mkString(" "))
    val other = "nothing in common with anything else here at all truly"
    val df = Seq((1L, quote), (2L, host), (3L, other)).toDF("doc_id", "text")
    val got = graft.operators.NearDup.containmentPairs(df, col("doc_id"),
        col("text"), n = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)),
      s"expected only quote->host, got $got")
    assert(got.head._3 == 1.0)
    // the symmetric Jaccard of the planted pair is far below 0.5 — the
    // MinHash near-dup path must NOT see it (that's containment's job)
    val jac = graft.operators.NearDup.nearDupPairs(df, col("doc_id"),
      col("text"), n = 3, numHashes = 16, rowsPerBand = 2,
      threshold = 0.5).count()
    assert(jac == 0L, "the planted pair must be invisible to Jaccard dedup")
    // exactness: brute force over hashed trigram sets agrees at several
    // thresholds (prefix never loses a qualifying pair)
    val sets = df.select(col("doc_id"),
        graft.operators.NearDup.hashedShingles(col("text"), 3).as("h"))
      .as[(Long, Seq[Long])].collect().map { case (i, h) => i -> h.toSet }
      .toMap
    for (t <- Seq(0.3, 0.6, 0.9)) {
      // Seq views — a for over a Map yielding pairs collapses by key
      val brute = (for {
        (a, ha) <- sets.toSeq; (b, hb) <- sets.toSeq
        if a != b && ha.nonEmpty
        c = ha.intersect(hb).size.toDouble / ha.size
        if c >= t
      } yield (a, b)).toSet
      val found = graft.operators.NearDup.containmentPairs(df, col("doc_id"),
          col("text"), n = 3, threshold = t)
        .select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet
      assert(found == brute, s"at t=$t: found $found vs brute $brute")
    }
    val plan = graft.operators.NearDup.containmentPairs(df, col("doc_id"),
      col("text"), n = 3, threshold = 0.9).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    intercept[IllegalArgumentException] {
      graft.operators.NearDup.containmentPairs(df, col("doc_id"),
        col("text"), n = 3, threshold = 0.0)
    }
  }

  test("jaccardPairs: exact symmetric pairs against a brute-force " +
    "recomputation at several thresholds (prefix + length filter lose " +
    "nothing), unordered output with id_a < id_b, no cartesian product") {
    val twinA = "the quick brown fox jumps over the lazy dog again today"
    val twinB = "the quick brown fox jumps over the lazy dog again tomorrow"
    val other = "nothing in common with anything else here at all truly"
    val exact = twinA // J = 1.0 with doc 1
    val df = Seq((1L, twinA), (2L, twinB), (3L, other), (4L, exact))
      .toDF("doc_id", "text")
    val sets = df.select(col("doc_id"),
        graft.operators.NearDup.hashedShingles(col("text"), 3).as("h"))
      .as[(Long, Seq[Long])].collect().map { case (i, h) => i -> h.toSet }
      .toMap
    for (t <- Seq(0.3, 0.6, 0.9, 1.0)) {
      // iterate Seq views: a for over a Map yielding (a, b) pairs
      // builds a MAP and silently collapses same-id_a pairs
      val brute = (for {
        (a, ha) <- sets.toSeq; (b, hb) <- sets.toSeq
        if a < b && ha.nonEmpty && hb.nonEmpty
        j = ha.intersect(hb).size.toDouble / ha.union(hb).size
        if j >= t
      } yield (a, b)).toSet
      val found = graft.operators.NearDup.jaccardPairs(df, col("doc_id"),
          col("text"), n = 3, threshold = t)
        .select(col("id_a"), col("id_b"))
        .as[(Long, Long)].collect().toSet
      assert(found == brute, s"at t=$t: found $found vs brute $brute")
      assert(found.forall(p => p._1 < p._2), "output must be id_a < id_b")
    }
    // the exact-copy pair reports J = 1.0; the twins report their true
    // value; similarity values match the brute-force doubles
    val vals = graft.operators.NearDup.jaccardPairs(df, col("doc_id"),
        col("text"), n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    assert(vals((1L, 4L)) == 1.0)
    val bruteJ = sets(1L).intersect(sets(2L)).size.toDouble /
      sets(1L).union(sets(2L)).size
    assert(math.abs(vals((1L, 2L)) -
      (math.rint(bruteJ * 1e6) / 1e6)) < 1e-12)
    val plan = graft.operators.NearDup.jaccardPairs(df, col("doc_id"),
      col("text"), n = 3, threshold = 0.8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    intercept[IllegalArgumentException] {
      graft.operators.NearDup.jaccardPairs(df, col("doc_id"),
        col("text"), n = 3, threshold = 1.5)
    }
  }

  test("bandedCandidates never pairs a doc with itself and orders ids") {
    val sh = docs.select(col("doc_id").as("id"),
      minhashSignature(hashedShingles(col("text"), 2), 8).as("sig"))
    val cand = bandedCandidates(sh, "id", "sig")
      .as[(Long, Long)].collect()
    assert(cand.forall { case (a, b) => a < b })
  }
}
