package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{IvfIndex, ProductQuantization => PQ}

class PqSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  private lazy val model =
    PQ.train(emb, col("embedding"), dim = 64, numSub = 8, k = 16,
      iters = 3, seed = 42L)

  test("train: 8 codebooks of 16 centroids, dsub 8; encode: codes in [0,16)") {
    assert(model.length == 8 && model.forall(_.length == 16))
    assert(model.forall(_.forall(_.vec.length == 8)))
    val codes = PQ.encode(emb, col("embedding"), model)
      .select(col("pq_codes")).as[Seq[Long]].collect()
    assert(codes.forall(_.length == 8))
    assert(codes.forall(_.forall(c => c >= 0 && c < 16)))
  }

  test("ADC approx == squared L2 to the reconstruction, bit for bit " +
    "(per-subspace accumulation order shared by kernel, LUT, and oracle)") {
    val q = emb.where(col("vec_id") === 1)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lut = PQ.adcLut(model, q)
    val rows = PQ.encode(emb, col("embedding"), model)
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("pq_codes"))
      .as[(Long, Seq[Long])].collect()
    rows.foreach { case (_, codes) =>
      val viaLut = codes.zipWithIndex
        .map { case (c, m) => lut(m)(c.toInt) }.reduce(_ + _)
      // reconstruction: per-subspace squared L2 to the selected centroid,
      // summed ascending m — the same double order the LUT was built with
      val direct = codes.zipWithIndex.map { case (c, m) =>
        val cent = model(m).sortBy(_.id).apply(c.toInt).vec
        var acc = 0.0d
        cent.indices.foreach { i =>
          val d = q(m * 8 + i).toDouble - cent(i).toDouble
          acc += d * d
        }
        acc
      }.reduce(_ + _)
      assert(java.lang.Double.doubleToRawLongBits(viaLut) ==
        java.lang.Double.doubleToRawLongBits(direct))
    }
  }

  test("pq search: recall@10 vs exact flat euclidean at sf0.01 (R=50)") {
    val encoded = PQ.encode(emb, col("embedding"), model).localCheckpoint()
    val queries = emb.where(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recalls = queries.map { case (_, q) =>
      val qCol = array(q.toIndexedSeq.map(lit(_)): _*).cast("array<float>")
      val flat = emb
        .withColumn("distance", round(
          graft.functions.VectorExpressions.euclideanDistance(col("embedding"), qCol),
          6) + lit(0.0d))
        .orderBy("distance", "vec_id").limit(10)
        .select("vec_id").as[Long].collect().toSet
      val pq = PQ.search(encoded, "embedding", "vec_id", model, q,
        k = 10, rescore = 50)
        .select("vec_id").as[Long].collect().toSet
      (flat intersect pq).size.toDouble / flat.size
    }
    val recall = recalls.sum / recalls.length
    info(f"PQ (M=8, K=16, R=50) recall@10 over ${queries.length} queries: $recall%.3f")
    // 32x compression is far lossier than SQ8's 4x — the floor guards the
    // pipeline (encode/ADC/rescore), not near-exactness
    assert(recall >= 0.5, f"recall@10 $recall%.3f < 0.5")
  }

  test("guards: dim must divide into numSub; rescore >= k > 0") {
    intercept[IllegalArgumentException] {
      PQ.train(emb, col("embedding"), dim = 64, numSub = 7, k = 4)
    }
    val enc = PQ.encode(emb, col("embedding"), model)
    intercept[IllegalArgumentException] {
      PQ.search(enc, "embedding", "vec_id", model,
        Array.fill(64)(0f), k = 0, rescore = 5)
    }
    intercept[IllegalArgumentException] {
      PQ.search(enc, "embedding", "vec_id", model,
        Array.fill(64)(0f), k = 10, rescore = 5)
    }
    intercept[IllegalArgumentException] {
      PQ.adcLut(model, Array.fill(63)(0f)) // wrong query dimension
    }
  }

  test("committed codebook fixture matches a fresh deterministic train " +
    "in shape and ids (cid 0..15 per sub, dsub 8)") {
    val fixture = graft.queries.AnnQueries.fixturePqModel(spark)
    assert(fixture.length == 8 && fixture.forall(_.length == 16))
    assert(fixture.forall(_.forall(_.vec.length == 8)))
    assert(fixture.forall(cb => cb.map(_.id) == (0L until 16L)))
  }
}
