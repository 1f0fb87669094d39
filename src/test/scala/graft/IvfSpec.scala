package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfIndex
import graft.operators.IvfIndex.Centroid

class IvfSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val centroids = Seq(
    Centroid(0L, Array(1f, 0f)), Centroid(1L, Array(0f, 1f)),
    Centroid(2L, Array(-1f, 0f)))

  private val vecs = Seq(
    (10L, Seq(0.9f, 0.1f)),   // cell 0
    (11L, Seq(0.1f, 0.9f)),   // cell 1
    (12L, Seq(-0.9f, 0.1f)),  // cell 2
    (13L, Seq(0.8f, 0.2f)),   // cell 0
  ).toDF("vec_id", "embedding")

  test("cell assignment is argmin of euclidean distance") {
    val cells = vecs.select($"vec_id",
      IvfIndex.cellColumn(col("embedding"), centroids).as("cell"))
      .as[(Long, Long)].collect().toMap
    assert(cells == Map(10L -> 0L, 11L -> 1L, 12L -> 2L, 13L -> 0L))
  }

  test("equidistant vector breaks ties by centroid id") {
    val tied = Seq((1L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val cell = tied.select(IvfIndex.cellColumn(col("embedding"), centroids))
      .as[Long].head()
    assert(cell == 0L) // equally close to centroids 0 and 1
  }

  test("nearestCentroids: driver-side probe matches expectation") {
    assert(IvfIndex.nearestCentroids(Array(0.9f, 0.1f), centroids, 2) == Seq(0L, 1L))
  }

  test("search scans only probed cells (stored cell column)") {
    // nprobe=1 from (1,0): only cell 0 -> 12 and 11 can never appear
    val indexed = IvfIndex.withCell(vecs, col("embedding"), centroids)
    val got = IvfIndex.search(indexed, "embedding", "vec_id", centroids,
      Array(1f, 0f), nprobe = 1, "cosine", k = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(got == Set(10L, 13L))
  }

  test("nprobe = C recovers exact brute-force top-k") {
    val exact = vecs
      .withColumn("distance",
        graft.functions.VectorFunctions.cosineDistance(col("embedding"),
          array(lit(1f), lit(0f))))
      .orderBy("distance", "vec_id").select("vec_id").as[Long].collect().toSeq
    val indexed = IvfIndex.withCell(vecs, col("embedding"), centroids)
    val ivf = IvfIndex.search(indexed, "embedding", "vec_id", centroids,
      Array(1f, 0f), nprobe = 3, "cosine", k = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == exact)
  }

  test("cell expression works at C >= 64 under strict codegen " +
    "(no silent interpreted fallback)") {
    val many = (0 until 80).map(i =>
      Centroid(i.toLong, Array(math.cos(i * 0.1).toFloat, math.sin(i * 0.1).toFloat)))
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = IvfIndex.withCell(vecs, col("embedding"), many)
        .where(col("cell") >= 0).count()
      assert(n == 4)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("train is deterministic under repartitioning (weighted distinct " +
    "content-hash sample + fully-specified local k-means)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val a = IvfIndex.train(emb, col("embedding"), c = 8, seed = 9L)
    val b = IvfIndex.train(emb.repartition(13), col("embedding"), c = 8,
      seed = 9L)
    assert(a.map(c => (c.id, c.vec.toSeq)) == b.map(c => (c.id, c.vec.toSeq)))
  }

  test("best-of-N seeding: restarts=1 is exactly fit(seed); fitBest " +
    "returns the minimum quantization error of its window; the trained " +
    "model never has HIGHER error than the single-seed fit") {
    import graft.operators.KMeans
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val (pts, w) = KMeans.sampleWeighted(emb, col("embedding"), 2048, 42L)
    val single = KMeans.fit(pts, w, 8, 25, 42L)
    val best1 = KMeans.fitBest(pts, w, 8, 25, 42L, restarts = 1)
    assert(best1.map(_.toSeq).toSeq == single.map(_.toSeq).toSeq)
    val bestN = KMeans.fitBest(pts, w, 8, 25, 42L, restarts = 6)
    val errs = (0 until 6).map(r =>
      KMeans.quantizationError(pts, w, KMeans.fit(pts, w, 8, 25, 42L + r)))
    assert(KMeans.quantizationError(pts, w, bestN) == errs.min)
    assert(KMeans.quantizationError(pts, w, bestN) <=
      KMeans.quantizationError(pts, w, single))
    intercept[IllegalArgumentException] {
      KMeans.fitBest(pts, w, 8, 25, 42L, restarts = 0)
    }
  }

  /** The number the reference claims (~95%) but never measures
    * (reference README.md:174-179): recall@10 of a trained IVF index vs
    * flat search, on the real sf0.01 embeddings.
    *
    * Honest caveat, measured: these synthetic embeddings are near-UNIFORM
    * on the sphere (a C x nprobe sweep shows recall tracking the probed
    * fraction: C=16/nprobe=4 -> 0.66, C=8/nprobe=8 -> 1.0), so IVF's
    * advantage is bounded here — the committed config C=8/nprobe=6 probes
    * 75% for 0.91+ recall, the k-means gain over random probing being the
    * remainder. On a real clustered corpus the same operator probes far
    * less for the same recall; the point of this test is that the NUMBER
    * is measured and pinned, not guessed. */
  test("k-means IVF: recall@10 >= 0.9 vs flat at sf0.01 (C=8, nprobe=6)") {
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val model = IvfIndex.train(emb, col("embedding"), c = 8, iters = 5)
    assert(model.size == 8)
    val indexed = IvfIndex.withCell(emb, col("embedding"), model)
      .select("vec_id", "embedding", "cell").localCheckpoint()
    val queries = emb.where(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recalls = queries.map { case (_, q) =>
      val flat = emb
        .withColumn("distance", round(graft.functions.VectorFunctions.cosineDistance(
          col("embedding"), array(q.toIndexedSeq.map(lit(_)): _*).cast("array<float>")),
          6) + lit(0.0d))
        .orderBy("distance", "vec_id").limit(10)
        .select("vec_id").as[Long].collect().toSet
      val ivf = IvfIndex.search(indexed, "embedding", "vec_id", model, q,
        nprobe = 6, "cosine", k = 10)
        .select("vec_id").as[Long].collect().toSet
      (flat intersect ivf).size.toDouble / flat.size
    }
    val recall = recalls.sum / recalls.length
    info(f"IVF recall@10 over ${queries.length} queries: $recall%.3f")
    assert(recall >= 0.9, f"recall@10 $recall%.3f < 0.9")
  }
}
