package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._
import graft.operators.LshIndex

/** LSH bucket hash + two-phase search semantics
  * (reference: vector_db/indexes.py:165-242). */
class LshSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val cfg = LshIndex.Config(numProjections = 4, dim = 8, seed = 123L)

  private def vecs(n: Int): Seq[(Long, Seq[Float])] = {
    val rng = new scala.util.Random(7)
    (0L until n).map(i => i -> Seq.fill(8)(rng.nextFloat() * 2 - 1))
  }

  private def bucketsOf(rows: Seq[(Long, Seq[Float])]): Map[Long, Long] =
    LshIndex.withBucket(rows.toDF("vec_id", "embedding"), col("embedding"), cfg)
      .select("vec_id", "bucket").as[(Long, Long)].collect().toMap

  test("projection matrix is deterministic given the seed") {
    val a = projectionMatrix(4, 8, 42L)
    val b = projectionMatrix(4, 8, 42L)
    val c = projectionMatrix(4, 8, 43L)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.toSeq != c.flatten.toSeq)
  }

  test("buckets are in [0, 2^numProjections)") {
    val bs = bucketsOf(vecs(64)).values
    assert(bs.forall(b => b >= 0 && b < 16))
  }

  test("positive scaling preserves the bucket (sign-invariant hash)") {
    val base = vecs(16)
    val scaled = base.map { case (id, v) => (id, v.map(_ * 3.5f)) }
    assert(bucketsOf(base) == bucketsOf(scaled))
  }

  test("boundedHistogram accepts cap = Int.MaxValue without overflowing " +
    "the limit (any positive cap is valid per settings validation)") {
    val indexed = LshIndex.withBucket(
      vecs(32).toDF("vec_id", "embedding"),
      org.apache.spark.sql.functions.col("embedding"),
      LshIndex.Config(4, 8, 42L))
    val h = LshIndex.boundedHistogram(indexed, Int.MaxValue)
    assert(h.nonEmpty && h.get.map(_._2).sum == 32L)
  }

  test("projectionsFor: smallest P bounding expected occupancy, clamped " +
    "to [minP, MaxProjections] — the shared engine/bench sizing rule") {
    // exact boundary: ceil(n / 2^P) <= target
    assert(LshIndex.projectionsFor(1000, 1000) == 1)
    assert(LshIndex.projectionsFor(2000, 1000) == 1)   // ceil(2000/2)=1000
    assert(LshIndex.projectionsFor(2001, 1000) == 2)
    assert(LshIndex.projectionsFor(6000, 64) == 7)     // 6000/128=46.9
    assert(LshIndex.projectionsFor(60000, 64) == 10)   // 60000/1024=58.6
    // growing corpus, fixed target: P tracks log2(n)
    assert(LshIndex.projectionsFor(600000, 64) == 14)
    // clamps: empty corpus stays at minP, huge corpus at the 62 ceiling
    assert(LshIndex.projectionsFor(0, 10) == 1)
    assert(LshIndex.projectionsFor(Long.MaxValue, 1) == LshIndex.MaxProjections)
    assert(LshIndex.projectionsFor(100, 1000, minP = 8) == 8)
    intercept[IllegalArgumentException] { LshIndex.projectionsFor(10, 0) }
  }

  test("bucket hash rejects empty and oversized matrices") {
    intercept[IllegalArgumentException] {
      lshBucket(col("v"), Array.empty[Array[Double]])
    }
    intercept[IllegalArgumentException] {
      lshBucket(col("v"), Array.fill(63, 2)(0.5))
    }
  }

  test("fallback path: < k bucket candidates gives exactly the flat result " +
    "(reference indexes.py:223-224)") {
    val rows = vecs(12) // 12 vectors across 16 buckets: every bucket < k=10
    val df = rows.toDF("vec_id", "embedding")
    val indexed = LshIndex.withBucket(df, col("embedding"), cfg)
    val q = indexed.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    val lsh = LshIndex.searchTwoPhase(indexed, q, "embedding", "cosine", 10)
      .as[(Long, Double)].collect().toSeq

    val qFlat = df.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val flat = df.crossJoin(broadcast(qFlat))
      .withColumn("distance",
        round(cosineDistance(col("embedding"), col("qvec")), 6) + lit(0.0d))
      .select(col("vec_id"), col("distance"))
      .orderBy(col("distance"), col("vec_id")).limit(10)
      .as[(Long, Double)].collect().toSeq

    assert(lsh == flat)
  }

  test("bucket path: results come only from the query's bucket") {
    // Many vectors, k=2: the query bucket certainly holds >= 2 of 256.
    val rows = vecs(256)
    val df = rows.toDF("vec_id", "embedding")
    val indexed = LshIndex.withBucket(df, col("embedding"), cfg)
    val q = indexed.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    val qBucket = bucketsOf(rows)(0L)
    val got = LshIndex.searchTwoPhase(indexed, q, "embedding", "cosine", 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.size == 2)
    val byId = bucketsOf(rows)
    assert(got.forall { case (id, _) => byId(id) == qBucket })
    // the query row itself (distance 0) is in its own bucket and must win
    assert(got.head._1 == 0L && got.head._2 == 0.0)
  }

  /** Measured recall@10 of the single-bucket LSH probe vs flat search on
    * the real sf0.01 embeddings with the committed query config
    * (4 projections / 16 buckets, seed 42 — LshQueries.config). The
    * reference claims "~95% accuracy" without ever measuring
    * (README.md:174-179); this pins the actual number so a config change
    * that craters recall fails CI. */
  test("LSH bucket path: measured recall@10 vs flat at sf0.01") {
    val queryCfg = LshIndex.Config(numProjections = 4, dim = 64, seed = 42L)
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val indexed = LshIndex.withBucket(emb, col("embedding"), queryCfg)
      .select("vec_id", "embedding", "bucket").localCheckpoint()
    val queries = emb.where(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1))
    val recallPairs = queries.map { case (id, qv) =>
      // baseline ranks by the SAME rounded distance the search paths use,
      // so a 6dp tie broken by id cannot read as a false recall miss
      val flat = emb.withColumn("distance",
          round(cosineDistance(col("embedding"),
            array(qv.map(lit(_)): _*).cast("array<float>")), 6) + lit(0.0d))
        .orderBy("distance", "vec_id").limit(10)
        .select("vec_id").as[Long].collect().toSet
      val q = indexed.where(col("vec_id") === id)
        .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
      val single = LshIndex.searchTwoPhase(indexed, q, "embedding", "cosine", 10)
        .select("vec_id").as[Long].collect().toSet
      val multi = LshIndex.searchMultiProbe(indexed, q, "embedding", "cosine",
          10, queryCfg.numProjections)
        .select("vec_id").as[Long].collect().toSet
      ((flat intersect single).size.toDouble / flat.size,
        (flat intersect multi).size.toDouble / flat.size)
    }
    val recall = recallPairs.map(_._1).sum / recallPairs.length
    val recallMp = recallPairs.map(_._2).sum / recallPairs.length
    info(f"LSH single-bucket recall@10 over ${queries.length} queries: $recall%.3f")
    info(f"LSH multi-probe  recall@10 over ${queries.length} queries: $recallMp%.3f")
    // Measured 0.19 single / 0.53 multi-probe on these near-uniform
    // synthetic embeddings — low in absolute terms but 3x (resp. ~8x) the
    // 1/16 random-probe baseline, i.e. the hash genuinely concentrates
    // neighbors and Hamming-1 probing recovers most of what one bucket
    // misses. (The reference's "~95%" claim is unreproducible on uniform
    // data; a user choosing numProjections/probing now has measured
    // numbers per config.) Floors guard against a hash regression, not
    // against the data distribution.
    assert(recall >= 0.15, f"single recall@10 $recall%.3f < 0.15")
    // NOT asserting recallMp >= recall: the < k fallback can fire
    // asymmetrically (single-bucket under k falls back to an EXACT scan
    // while the multi-probe candidate set stays on the probe path), so
    // cross-path dominance is not an invariant — only the floor is.
    assert(recallMp >= 0.4, f"multi-probe recall@10 $recallMp%.3f < 0.4")
  }

  test("adaptive probing: probe set grows with the target, covers the " +
    "query bucket first, and degenerates to exact search past the corpus") {
    val rows = vecs(256)
    val df = rows.toDF("vec_id", "embedding")
    val indexed = LshIndex.withBucket(df, col("embedding"), cfg)
    val q = rows.head._2
    val ms = LshIndex.margins(cfg.matrix, q)
    val hist = indexed.groupBy("bucket").count()
      .as[(Long, Long)].collect().toSeq
    // the query's own bucket has flip cost 0 and is always probed first
    val qb = LshIndex.bucketOf(ms)
    assert(LshIndex.probePrefix(hist, qb, ms, 1).headOption.contains(qb))
    // prefix is monotone in the target and the cumulative count reaches it
    val small = LshIndex.probePrefix(hist, qb, ms, 40)
    val big = LshIndex.probePrefix(hist, qb, ms, 120)
    assert(small.toSet.subsetOf(big.toSet) && small.size <= big.size)
    val histMap = hist.toMap
    assert(small.map(histMap).sum >= 40 && big.map(histMap).sum >= 120)
    // a target >= corpus selects every bucket -> exactly the flat result
    val adaptive = LshIndex.searchAdaptive(indexed, q, cfg.matrix,
        "cosine", 10, multiplier = 100) // target 1000 > 256 rows
      .as[(Long, Double)].collect().toSeq
    val qFlat = df.where(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val flat = df.crossJoin(broadcast(qFlat))
      .withColumn("distance",
        round(cosineDistance(col("embedding"), col("qvec")), 6) + lit(0.0d))
      .select(col("vec_id"), col("distance"))
      .orderBy(col("distance"), col("vec_id")).limit(10)
      .as[(Long, Double)].collect().toSeq
    assert(adaptive == flat)
    // a partial target still returns k rows, query row (distance 0) first
    val partial = LshIndex.searchAdaptive(indexed, q, cfg.matrix,
        "cosine", 10, multiplier = 4) // target 40 of 256
      .as[(Long, Double)].collect().toSeq
    assert(partial.size == 10 && partial.head == (0L -> 0.0))
    // measured on sf0.1 (Bench recall map): adaptive multiplier sweep
    // 50 -> 0.57, 80 -> 0.71, 110 -> 0.81, 150 (default) -> 0.90 recall@10
    // on an 8-projection index — vs 0.30 single-bucket / 0.54 Hamming-1.
  }

  test("allow-set fallback scans the allow-set, not all vectors") {
    val rows = vecs(64)
    val df = rows.toDF("vec_id", "embedding")
    val allowed = rows.map(_._1).filter(_ % 5 == 0).toSet
    val indexed = LshIndex.withBucket(df, col("embedding"), cfg)
      .where(col("vec_id") % 5 === 0) // ~13 rows: any bucket slice < 10
    val q = LshIndex.withBucket(df, col("embedding"), cfg)
      .where(col("vec_id") === 1)
      .select(col("embedding").as("qvec"), col("bucket").as("qbucket"))
    val got = LshIndex.searchTwoPhase(indexed, q, "embedding", "cosine", 10)
      .as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.forall { case (id, _) => allowed(id) })
  }
}
