package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.MetadataFunctions._

/** Typed metadata equality (reference: vector_db/vector_store.py:261-265 —
  * `1` must not match `"1"`). */
class MetadataSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Map("tag" -> "i:3", "lang" -> "s:en")),
    (2L, Map("tag" -> "s:3", "lang" -> "s:en")),
    (3L, Map("tag" -> "i:3", "lang" -> "s:de")),
    (4L, Map("tag" -> "b:true", "score" -> "f:1.5")),
  ).toDF("id", "metadata")

  private def ids(filters: Map[String, Any]): Set[Long] =
    df.where(filterPredicate(col("metadata"), filters))
      .select("id").as[Long].collect().toSet

  test("encode carries the runtime type") {
    assert(encodeValue(3) == "i:3")
    assert(encodeValue(3L) == "i:3")
    assert(encodeValue("3") == "s:3")
    assert(encodeValue(true) == "b:true")
    assert(encodeValue(1.5) == "f:1.5")
    assert(encodeValue(1.5f) == "f:1.5")
  }

  test("int 3 and string \"3\" match disjoint rows") {
    assert(ids(Map("tag" -> 3)) == Set(1L, 3L))
    assert(ids(Map("tag" -> "3")) == Set(2L))
  }

  test("conjunctive filter requires every key to match") {
    assert(ids(Map("tag" -> 3, "lang" -> "en")) == Set(1L))
  }

  test("missing key matches nothing") {
    assert(ids(Map("absent" -> 1)) == Set.empty[Long])
  }

  test("empty filter matches everything") {
    assert(ids(Map.empty) == Set(1L, 2L, 3L, 4L))
  }

  test("bool and float values are typed too") {
    assert(ids(Map("tag" -> true)) == Set(4L))
    assert(ids(Map("score" -> 1.5)) == Set(4L))
  }

  test("unsupported metadata value type is rejected") {
    intercept[IllegalArgumentException] { encodeValue(Seq(1, 2)) }
  }
}
