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

  test("search scans only probed cells") {
    // nprobe=1 from (1,0): only cell 0 -> 12 and 11 can never appear
    val got = IvfIndex.search(vecs, "embedding", "vec_id", centroids,
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
    val ivf = IvfIndex.search(vecs, "embedding", "vec_id", centroids,
      Array(1f, 0f), nprobe = 3, "cosine", k = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(ivf == exact)
  }
}
