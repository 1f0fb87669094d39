package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorExpressions
import graft.operators.{IvfIndex, LshIndex, ProductQuantization, Quantization}
import graft.tools.SyntheticEmbeddings

/** Honest ANN telemetry: the shipped default funnels must hold
  * recall@10 >= 0.9 on a CLUSTERED embedding space (mixture of
  * Gaussians — the shape real embedding tables have), not only on the
  * near-uniform driver testdata where bucket quality is unobservable.
  * The generator is deterministic, so these are exact regression pins,
  * not flaky statistics. */
class RecallSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val Dim = 64
  private lazy val emb: DataFrame =
    SyntheticEmbeddings.clustered(spark, n = 1500L, dim = Dim, clusters = 24)
      .localCheckpoint()
  private lazy val queries: Seq[(Long, Array[Float])] =
    emb.where(col("vec_id") < 5).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toSeq

  private def qCol(q: Array[Float]) =
    array(q.toIndexedSeq.map(x => lit(x)): _*).cast("array<float>")

  private def topIds(df: DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  private def flat(q: Array[Float], metric: String): Set[Long] = topIds(
    emb.withColumn("d", round(metric match {
        case "cosine" => VectorExpressions.cosineDistance(col("embedding"), qCol(q))
        case _ => VectorExpressions.euclideanDistance(col("embedding"), qCol(q))
      }, 6) + lit(0.0d))
      .orderBy(col("d"), col("vec_id")).limit(10))

  private def recall(metric: String)(search: Array[Float] => Set[Long]): Double = {
    val rs = queries.map { case (_, q) =>
      val truth = flat(q, metric)
      (truth intersect search(q)).size.toDouble / truth.size
    }
    rs.sum / rs.size
  }

  test("clustered shape is genuinely clustered (sanity: a point's " +
    "cluster-mates dominate its neighbors)") {
    val (qid, q) = queries.head
    val mates = flat(q, "cosine").count(id => id % 24 == qid % 24)
    assert(mates >= 8, s"only $mates/10 neighbors share the cluster")
  }

  test("adaptive LSH (the facade default probe) holds recall@10 >= 0.9 " +
    "on the clustered shape") {
    val cfg = LshIndex.Config(numProjections = 8, dim = Dim, seed = 42L)
    val indexed = LshIndex.withBucket(emb, col("embedding"), cfg)
      .localCheckpoint()
    val r = recall("cosine") { q =>
      topIds(LshIndex.searchAdaptive(indexed, q.toIndexedSeq, cfg.matrix,
        "cosine", 10))
    }
    assert(r >= 0.9, s"adaptive LSH recall $r < 0.9")
  }

  test("IVF at the default nprobe=6 holds recall@10 >= 0.9 on the " +
    "clustered shape") {
    val model = IvfIndex.train(emb, col("embedding"), c = 8)
    val cells = IvfIndex.withCell(emb, col("embedding"), model)
      .localCheckpoint()
    val r = recall("cosine") { q =>
      topIds(IvfIndex.search(cells, "embedding", "vec_id", model, q,
        nprobe = 6, "cosine", 10))
    }
    assert(r >= 0.9, s"IVF np6 recall $r < 0.9")
  }

  test("SQ8 at the default rescore holds recall@10 >= 0.9 on the " +
    "clustered shape") {
    val encoded = Quantization.encode(emb, col("embedding")).localCheckpoint()
    val r = recall("euclidean") { q =>
      topIds(Quantization.search(encoded, "embedding", "vec_id", q,
        k = 10, rescore = 50, metric = "euclidean"))
    }
    assert(r >= 0.9, s"SQ8 recall $r < 0.9")
  }

  test("residual IVFPQ at the engine defaults (np6, R=150) holds " +
    "recall@10 >= 0.9 on the clustered shape") {
    val model = IvfIndex.train(emb, col("embedding"), c = 8)
    val cells = IvfIndex.withCell(emb, col("embedding"), model)
      .localCheckpoint()
    val resModel = ProductQuantization.train(
      cells, ProductQuantization.residualColumn(
        col("embedding"), col("cell"), model),
      dim = Dim, numSub = 8, k = 256)
    val resEnc = ProductQuantization.encodeResidual(
      cells, col("embedding"), col("cell"), model, resModel)
      .localCheckpoint()
    val r = recall("euclidean") { q =>
      val probed = IvfIndex.nearestCentroids(q, model, 6)
      topIds(ProductQuantization.searchResidual(
        resEnc.where(col("cell").isin(probed: _*)),
        "embedding", "vec_id", resModel, model, probed, q,
        k = 10, rescore = 150))
    }
    assert(r >= 0.9, s"residual IVFPQ recall $r < 0.9")
  }
}
