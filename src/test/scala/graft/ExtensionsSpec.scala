package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface: GraftExtensions registers the Catalyst expressions
  * as spark.sql functions. Needs its own session (extensions bind at
  * session build). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // getOrCreate returns any existing default session and silently skips
    // withExtensions — clear the defaults first so a REAL extensions-bound
    // session is built (it shares the JVM's SparkContext), then restore
    // the shared session for the other suites.
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    prior.foreach { p =>
      SparkSession.setDefaultSession(p)
      SparkSession.setActiveSession(p)
    }
    s
  }

  test("cosine_distance is callable from SQL") {
    val d = spark.sql(
      "SELECT cosine_distance(array(cast(1.0 as float), cast(0.0 as float)), " +
        "array(cast(0.0 as float), cast(1.0 as float)))")
      .head().getDouble(0)
    assert(math.abs(d - 1.0) < 1e-12)
  }

  test("euclidean_distance and dot_product are callable from SQL") {
    val r = spark.sql(
      "SELECT euclidean_distance(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(4.0 as float), cast(6.0 as float)))," +
        " dot_product(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float)))").head()
    assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 11.0)
  }

  test("hashed_shingles and simhash compose in SQL") {
    val sim = spark.sql(
      "SELECT simhash(hashed_shingles('the quick brown fox', 2), 16)")
      .head().getLong(0)
    assert(sim >= 0 && sim < (1L << 16))
  }

  test("wrong input type fails analysis, not execution") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_distance(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(e.getMessage.contains("array<float>") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
