package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Core relational semantics that the oracle gate exercises indirectly,
  * plus the 100TB-scale variants that DuckDB cannot oracle-check
  * (approx_count_distinct). */
class CoreSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_count_distinct tracks exact countDistinct within its rsd " +
    "(the scale path behind agg_cardinalities)") {
    val df = (1 to 10000).map(i => i % 1234).toDF("x")
    val Row = df.agg(
      countDistinct(col("x")).as("exact"),
      approx_count_distinct(col("x"), 0.02).as("approx")).head()
    val exact = Row.getLong(0).toDouble
    val approx = Row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.06) // 3x rsd head-room
  }

  test("approx_percentile tracks exact percentile (the scale path behind " +
    "agg_percentiles)") {
    val rng = new scala.util.Random(5)
    val df = (1 to 20000).map(_ => rng.nextDouble() * 100).toDF("x")
    val r = df.agg(
      expr("percentile(x, 0.5)").as("exact"),
      expr("approx_percentile(x, 0.5, 1000)").as("approx")).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1.0)
  }

  test("offset+limit pagination returns the same slice as a row_number window") {
    val df = (1 to 500).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val viaOffset = df.orderBy("id").offset(100).limit(50)
      .select("id").as[Long].collect().toSeq
    import org.apache.spark.sql.expressions.Window
    val viaWindow = df
      .withColumn("rn", row_number().over(Window.orderBy("id")))
      .where(col("rn").between(101, 150)).select("id").as[Long].collect().toSeq
    assert(viaOffset == viaWindow)
  }

  test("salted two-phase top-k equals the single-window top-k") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 300).map(i => (i.toLong % 4, i.toLong, rng.nextDouble()))
      .toDF("query_id", "vec_id", "distance")
    import org.apache.spark.sql.expressions.Window
    val w2 = Window.partitionBy("query_id").orderBy("distance", "vec_id")
    val single = rows.withColumn("rn", row_number().over(w2))
      .where(col("rn") <= 5).drop("rn")
      .orderBy("query_id", "distance", "vec_id")
      .as[(Long, Long, Double)].collect().toSeq
    val w1 = Window.partitionBy("query_id", "salt").orderBy("distance", "vec_id")
    val salted = rows.withColumn("salt", pmod(col("vec_id"), lit(8)))
      .withColumn("rn1", row_number().over(w1)).where(col("rn1") <= 5)
      .withColumn("rn", row_number().over(w2)).where(col("rn") <= 5)
      .select("query_id", "vec_id", "distance")
      .orderBy("query_id", "distance", "vec_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(salted == single)
  }
}
