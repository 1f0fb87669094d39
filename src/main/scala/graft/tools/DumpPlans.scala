package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dump `.explain("formatted")` for named declared queries to files —
  * the optimization rounds' plan-evidence artifact
  * (`plans/rNN/<query>_<tag>.txt`). Usage:
  *
  *   runMain graft.tools.DumpPlans <outDir> <tag> <query> [query ...]
  *
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS exactly like Bench so the
  * captured plan is the one the bench executes. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpPlans <outDir> <tag> <query...>")
    val outDir = Paths.get(args(0))
    val tag = args(1)
    val names = args.drop(2).toSeq
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntryRef.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      Files.writeString(outDir.resolve(s"${n}_$tag.txt"), txt)
      println(s"wrote ${outDir.resolve(s"${n}_$tag.txt")}")
    }
    spark.stop()
  }

  /** Indirection so this file has no compile-order dependency surprises. */
  private object SparkEntryRef {
    def queries = graft.SparkEntry.queries
  }
}
