package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{ProductQuantization => PQ}

class PqSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
  // K=256 (one byte per code) is the DEFAULT — published PQ practice
  // (Jégou et al. TPAMI 2011; FAISS IndexPQ) and what the committed
  // fixture/gates/bench use. K=16 stays as the compression-extreme point.
  private lazy val model =
    PQ.train(emb, col("embedding"), dim = 64, numSub = 8, k = 256,
      seed = 42L)
  private lazy val model16 =
    PQ.train(emb, col("embedding"), dim = 64, numSub = 8, k = 16,
      seed = 42L)

  test("train: 8 codebooks of 256 centroids, dsub 8; encode: codes in [0,256)") {
    assert(model.length == 8 && model.forall(_.length == 256))
    assert(model.forall(_.forall(_.vec.length == 8)))
    val codes = PQ.encode(emb, col("embedding"), model)
      .select(col("pq_codes")).as[Seq[Long]].collect()
    assert(codes.forall(_.length == 8))
    assert(codes.forall(_.forall(c => c >= 0 && c < 256)))
  }

  test("ADC approx == squared L2 to the reconstruction, bit for bit " +
    "(per-subspace accumulation order shared by kernel, LUT, and oracle)") {
    val q = emb.where(col("vec_id") === 1)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lut = PQ.adcLut(model16, q)
    val rows = PQ.encode(emb, col("embedding"), model16)
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("pq_codes"))
      .as[(Long, Seq[Long])].collect()
    rows.foreach { case (_, codes) =>
      val viaLut = codes.zipWithIndex
        .map { case (c, m) => lut(m)(c.toInt) }.reduce(_ + _)
      // reconstruction: per-subspace squared L2 to the selected centroid,
      // summed ascending m — the same double order the LUT was built with
      val direct = codes.zipWithIndex.map { case (c, m) =>
        val cent = model16(m).apply(c.toInt).vec
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

  test("dot/cosine ADC == negated dot of the reconstruction (and its " +
    "norm-divided cosine form), bit for bit") {
    val q = emb.where(col("vec_id") === 1)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val lutDot = PQ.adcLut(model16, q, "dot_product")
    val lutCos = PQ.adcLut(model16, q, "cosine")
    // cosine and dot share the SAME negated-dot LUT (cosine divides by
    // norms downstream)
    lutDot.zip(lutCos).foreach { case (a, b) =>
      assert(a.toSeq == b.toSeq)
    }
    val rows = PQ.encode(emb, col("embedding"), model16)
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("pq_codes"))
      .as[(Long, Seq[Long])].collect()
    rows.foreach { case (_, codes) =>
      val viaLut = codes.zipWithIndex
        .map { case (c, m) => lutDot(m)(c.toInt) }.reduce(_ + _)
      // -dot(q, reconstruction): per-subspace dots accumulated ascending
      // i then m, negated per subspace — the LUT's exact order
      val direct = codes.zipWithIndex.map { case (c, m) =>
        val cent = model16(m).apply(c.toInt).vec
        var acc = 0.0d
        cent.indices.foreach { i =>
          acc += q(m * 8 + i).toDouble * cent(i).toDouble
        }
        -acc
      }.reduce(_ + _)
      assert(java.lang.Double.doubleToRawLongBits(viaLut) ==
        java.lang.Double.doubleToRawLongBits(direct))
    }
  }

  private def recallAt10(metric: String, pqModel: PQ.Model,
                         rescore: Int): Double = {
    val encoded = PQ.encode(emb, col("embedding"), pqModel,
      withNorm = metric == "cosine").localCheckpoint()
    val queries = emb.where(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val recalls = queries.map { case (_, q) =>
      val qCol = array(q.toIndexedSeq.map(lit(_)): _*).cast("array<float>")
      val flat = emb
        .withColumn("distance", round(
          graft.functions.VectorFunctions.distance(metric)(col("embedding"), qCol),
          6) + lit(0.0d))
        .orderBy("distance", "vec_id").limit(10)
        .select("vec_id").as[Long].collect().toSet
      val pq = PQ.search(encoded, "embedding", "vec_id", pqModel, q,
        k = 10, rescore = rescore, metric = metric)
        .select("vec_id").as[Long].collect().toSet
      (flat intersect pq).size.toDouble / flat.size
    }
    recalls.sum / recalls.length
  }

  test("pq search: recall@10 vs exact flat search at sf0.01, K=256, R=50 " +
    ">= 0.85 under ALL THREE metrics") {
    Seq("euclidean", "dot_product", "cosine").foreach { metric =>
      val recall = recallAt10(metric, model, rescore = 50)
      info(f"PQ (M=8, K=256, R=50, $metric) recall@10: $recall%.3f")
      assert(recall >= 0.85, f"$metric recall@10 $recall%.3f < 0.85")
    }
  }

  test("pq search: K=16 compression-extreme point still clears the " +
    "pipeline floor (recall@10 >= 0.5, euclidean)") {
    val recall = recallAt10("euclidean", model16, rescore = 50)
    info(f"PQ (M=8, K=16, R=50) recall@10: $recall%.3f")
    // 4-bit codebooks are far lossier — the floor guards the pipeline
    // (encode/ADC/rescore), not quality; K=256 is the quality gate above
    assert(recall >= 0.5, f"recall@10 $recall%.3f < 0.5")
  }

  test("residual kernel: CellResidualExpr == driver twin bit-for-bit, " +
    "and single-row residual codes == bulk residual codes") {
    import graft.operators.IvfIndex
    val cs = IvfIndex.train(emb, col("embedding"), c = 16, iters = 2, seed = 7L)
    val withCell = IvfIndex.withCell(emb, col("embedding"), cs)
    val rows = withCell
      .withColumn("rv", PQ.residualColumn(col("embedding"), col("cell"), cs))
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("cell"), col("rv"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1)
      val cell = r.getLong(2)
      val rv = r.getSeq[Float](3)
      assert(rv == PQ.residualLocal(cs, cell, v))
    }
    // bulk residual codes == encodeLocal over the local residual
    val resModel = PQ.train(withCell,
      PQ.residualColumn(col("embedding"), col("cell"), cs),
      dim = 64, numSub = 8, k = 16, iters = 2, seed = 7L)
    val coded = PQ.encodeResidual(withCell, col("embedding"), col("cell"),
      cs, resModel)
      .where(col("vec_id") < 50)
      .select(col("vec_id"), col("embedding"), col("cell"), col("pq_codes"))
      .collect()
    coded.foreach { r =>
      val v = r.getSeq[Float](1)
      val cell = r.getLong(2)
      val codes = r.getSeq[Long](3).map(_.toInt)
      assert(codes == PQ.encodeLocal(resModel, PQ.residualLocal(cs, cell, v)))
    }
  }

  test("IVFPQ: residual encoding recovers more recall than raw encoding " +
    "at identical M/K (measured, K=16 where the headroom is)") {
    import graft.operators.IvfIndex
    val cs = IvfIndex.train(emb, col("embedding"), c = 64, iters = 3, seed = 42L)
    val withCell = IvfIndex.withCell(emb, col("embedding"), cs).localCheckpoint()
    val rawModel = model16
    val resModel = PQ.train(withCell,
      PQ.residualColumn(col("embedding"), col("cell"), cs),
      dim = 64, numSub = 8, k = 16, seed = 42L)
    val rawEnc = PQ.encode(withCell, col("embedding"), rawModel).localCheckpoint()
    val resEnc = PQ.encodeResidual(withCell, col("embedding"), col("cell"),
      cs, resModel).localCheckpoint()
    val queries = emb.where(col("vec_id") < 20)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def flatTop(q: Array[Float]): Set[Long] = {
      val qCol = array(q.toIndexedSeq.map(lit(_)): _*).cast("array<float>")
      emb.withColumn("distance", round(
        graft.functions.VectorExpressions.euclideanDistance(col("embedding"), qCol),
        6) + lit(0.0d))
        .orderBy("distance", "vec_id").limit(10)
        .select("vec_id").as[Long].collect().toSet
    }
    // isolate ENCODING quality: probe every cell (no coverage loss) and
    // set rescore = k, so the ADC ordering alone decides what survives —
    // with a generous rescore the exact phase would hide any encoding
    // difference (every probed candidate gets rescored)
    val allCells = cs.map(_.id)
    val (rawR, resR) = queries.map { case (_, q) =>
      val flat = flatTop(q)
      val raw = PQ.search(rawEnc,
        "embedding", "vec_id", rawModel, q, k = 10, rescore = 10)
        .select("vec_id").as[Long].collect().toSet
      val res = PQ.searchResidual(resEnc,
        "embedding", "vec_id", resModel, cs, allCells, q, k = 10, rescore = 10)
        .select("vec_id").as[Long].collect().toSet
      ((flat intersect raw).size / 10.0, (flat intersect res).size / 10.0)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2)) match {
      case (a, b) => (a / queries.length, b / queries.length)
    }
    info(f"IVFPQ M=8 K=16 R=k recall@10 (pure encoding): raw $rawR%.3f, residual $resR%.3f")
    assert(resR >= rawR,
      f"residual recall $resR%.3f should not trail raw $rawR%.3f")
  }

  test("train is deterministic under repartitioning (content-hash sample " +
    "+ fully-specified local k-means, no reduction-order dependence)") {
    val a = PQ.train(emb, col("embedding"), dim = 64, numSub = 4, k = 8,
      iters = 5, seed = 11L)
    val b = PQ.train(emb.repartition(17), col("embedding"), dim = 64,
      numSub = 4, k = 8, iters = 5, seed = 11L)
    assert(a.map(_.map(c => (c.id, c.vec.toSeq))) ==
      b.map(_.map(c => (c.id, c.vec.toSeq))))
  }

  test("train on fewer distinct points than k exhausts k-means++ and " +
    "returns kEff = distinct codebooks (no duplicate centers)") {
    import spark.implicits._
    val three = Seq.tabulate(30)(i => Seq.fill(8)((i % 3).toFloat))
      .toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    val m = PQ.train(three, col("embedding"), dim = 8, numSub = 2, k = 8)
    m.foreach { cb =>
      assert(cb.length == 3, s"expected 3 centers, got ${cb.length}")
      assert(cb.map(_.id) == (0L until 3L))
      assert(cb.map(_.vec.toSeq).distinct.length == 3)
    }
  }

  test("train sample is skew-proof: a value duplicated past the whole " +
    "sample budget cannot monopolize it (distinct-value draw + weights)") {
    import spark.implicits._
    val rng = new scala.util.Random(3L)
    // one heavy value (1000 copies — bigger than k=2's 512-row budget)
    // plus 49 unique vectors; a row-wise hash-order draw could fill the
    // whole sample with the heavy value's duplicate run
    val heavy = Seq.fill(1000)(Seq.fill(8)(1.0f))
    val unique = Seq.fill(49)(Seq.fill(8)(rng.nextFloat() * 10f))
    val df = (heavy ++ unique).toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    val m = PQ.train(df, col("embedding"), dim = 8, numSub = 2, k = 2)
    m.foreach { cb =>
      assert(cb.length == 2, s"codebook collapsed to ${cb.length} center(s)")
      assert(cb.map(_.vec.toSeq).distinct.length == 2)
    }
  }

  test("guards: dim must divide into numSub; rescore >= k > 0; " +
    "unknown metric; cosine without a norm column") {
    intercept[IllegalArgumentException] {
      PQ.train(emb, col("embedding"), dim = 64, numSub = 7, k = 4)
    }
    val enc = PQ.encode(emb, col("embedding"), model16)
    intercept[IllegalArgumentException] {
      PQ.search(enc, "embedding", "vec_id", model16,
        Array.fill(64)(0f), k = 0, rescore = 5)
    }
    intercept[IllegalArgumentException] {
      PQ.search(enc, "embedding", "vec_id", model16,
        Array.fill(64)(0f), k = 10, rescore = 5)
    }
    intercept[IllegalArgumentException] {
      PQ.adcLut(model16, Array.fill(63)(0f)) // wrong query dimension
    }
    intercept[IllegalArgumentException] {
      PQ.adcLut(model16, Array.fill(64)(0f), metric = "manhattan")
    }
    intercept[IllegalArgumentException] {
      // cosine needs the stored norm; approxColumn refuses without it
      PQ.approxColumn(lit(0.0d), "cosine", None, lit(1.0d))
    }
  }

  test("committed codebook fixture matches a fresh deterministic train " +
    "in shape and ids (cid 0..255 per sub, dsub 8)") {
    val fixture = graft.queries.AnnQueries.fixturePqModel(spark)
    assert(fixture.length == 8 && fixture.forall(_.length == 256))
    assert(fixture.forall(_.forall(_.vec.length == 8)))
    assert(fixture.forall(cb => cb.map(_.id) == (0L until 256L)))
  }
}
