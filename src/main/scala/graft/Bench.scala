package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every registered query on SPARK_GRAFT_SF_DIR and
  * emits ONE machine-readable JSON line on stdout (and the same JSON to
  * BENCH.json) — `{"metric":"total","value":N,"unit":"sec","queries":{...},
  * "errors":{...},"sf":...}`.
  *
  * A full warm-up pass runs first so the first timed query does not absorb
  * JVM/JIT/parquet-footer warm-up. Failures are RECORDED, not swallowed: a
  * failed query contributes its name->message to "errors" and is excluded
  * from the timing map, so a broken query can never masquerade as a fast one.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Warm-up: run everything once, untimed (ignore failures here — they
    // are captured in the timed pass below).
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () }
    }

    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(n)(spark, sfDir).count()
        timings(n) = (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(n) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    val qs = timings.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}"""
    Files.writeString(Paths.get("BENCH.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
