package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions._

/** Distance kernels against hand-computed values (mirrors the reference's
  * tests/test_indexes.py:21-45 exactness checks). */
class VectorFunctionsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def dist(metric: String, v: Seq[Float], q: Seq[Float]): Double =
    Seq((v, q)).toDF("v", "q")
      .select(distance(metric)(col("v"), col("q")).as("d"))
      .head().getDouble(0)

  test("cosine: orthogonal vectors have distance 1") {
    assert(math.abs(dist("cosine", Seq(1f, 0f), Seq(0f, 1f)) - 1.0) < 1e-12)
  }

  test("cosine: parallel vectors have distance ~0") {
    assert(math.abs(dist("cosine", Seq(1f, 2f), Seq(2f, 4f))) < 1e-12)
  }

  test("cosine: opposite vectors have distance 2") {
    assert(math.abs(dist("cosine", Seq(1f, 0f), Seq(-1f, 0f)) - 2.0) < 1e-12)
  }

  test("cosine: zero-norm input gives +Infinity (reference indexes.py:112-113)") {
    assert(dist("cosine", Seq(0f, 0f), Seq(1f, 1f)).isPosInfinity)
    assert(dist("cosine", Seq(1f, 1f), Seq(0f, 0f)).isPosInfinity)
  }

  test("+Infinity distances sort last ascending (zero vectors never win top-k)") {
    val rows = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(0.9f, 0.1f)))
      .toDF("id", "v")
    val got = rows
      .select(col("id"), cosineDistance(col("v"), array(lit(1f), lit(0f))).as("d"))
      .orderBy(col("d"), col("id"))
      .select("id").as[Long].collect()
    assert(got.last == 2L)
  }

  test("euclidean: 3-4-5 triangle") {
    assert(math.abs(dist("euclidean", Seq(1f, 2f), Seq(4f, 6f)) - 5.0) < 1e-12)
  }

  test("euclidean: identical vectors have distance 0") {
    assert(dist("euclidean", Seq(3f, 4f), Seq(3f, 4f)) == 0.0)
  }

  test("dot_product: negated dot so ascending = most similar") {
    assert(dist("dot_product", Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)) == -32.0)
  }

  test("metric dispatch rejects unknown metric at plan-build time") {
    intercept[IllegalArgumentException] {
      distance("manhattan")(col("v"), col("q"))
    }
  }

  test("float32 inputs accumulate in double (no float rounding in the fold)") {
    // 0.1f is not exactly 0.1; the double fold must preserve the float32
    // values exactly rather than re-rounding per step.
    val d = dist("dot_product", Seq(0.1f, 0.1f), Seq(1f, 1f))
    assert(math.abs(-d - 2 * 0.1f.toDouble) < 1e-15)
  }
}
