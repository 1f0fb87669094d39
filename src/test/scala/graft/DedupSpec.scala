package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha"), (2L, "beta"), (3L, "alpha"), (4L, "gamma"), (5L, "alpha"),
    (6L, "beta")).toDF("id", "text")

  test("exactGroups: one row per distinct content with min-id keeper and multiplicity") {
    val got = Dedup.exactGroups(docs, col("text"), col("id"))
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L), (2L, 2L), (4L, 1L)))
  }

  test("exact: survivors are exactly the min-id row per distinct content") {
    val got = Dedup.exact(docs, col("text"), col("id"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L))
  }

  test("exact: no duplicates survive and all content is represented") {
    val surv = Dedup.exact(docs, col("text"), col("id"))
    assert(surv.select("text").distinct().count() == surv.count())
    assert(surv.select("text").as[String].collect().toSet ==
      Set("alpha", "beta", "gamma"))
  }
}
