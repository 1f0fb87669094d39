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

  test("bandedCandidates never pairs a doc with itself and orders ids") {
    val sh = docs.select(col("doc_id").as("id"),
      minhashSignature(hashedShingles(col("text"), 2), 8).as("sig"))
    val cand = bandedCandidates(sh, "id", "sig")
      .as[(Long, Long)].collect()
    assert(cand.forall { case (a, b) => a < b })
  }
}
