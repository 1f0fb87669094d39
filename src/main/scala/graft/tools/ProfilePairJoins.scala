package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level wall-clock profile of the NearDup pair-join machinery
  * (guide §1: measure first, noop sink so the sink never pollutes the
  * clock). Times each stage of jaccardPairs/containmentPairs at sf0.1
  * so a base-constant regression can be attributed to a STAGE, not
  * guessed at. Throwaway measurement tool — not part of the driver
  * contract. */
object ProfilePairJoins {
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
    import graft.operators.NearDup

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(mk: => DataFrame): Double = {
      spark.sparkContext.setJobDescription(label)
      noop(mk) // warm-up (JIT/codegen) — same consumer as the clock
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        noop(mk)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label%-40s ${runs(1)}%8.3f s  (min ${runs(0)}%.3f max ${runs(2)}%.3f)")
      runs(1)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    // full operators, end to end
    time("jaccardPairs(full)") {
      NearDup.jaccardPairs(docs, col("doc_id"), col("text"), n = 3,
        threshold = 0.5)
    }
    time("containmentPairs(full)") {
      NearDup.containmentPairs(docs, col("doc_id"), col("text"), n = 3,
        threshold = 0.9)
    }

    // stages (replicated inline from NearDup so each can be timed alone)
    val keyed = docs.select(col("doc_id").as("id"), col("text"))
      .withColumn("__dg", md5(col("text")))
    val reps0 = keyed.groupBy(col("__dg"))
      .agg(min(col("id")).as("grp"), any_value(col("text")).as("text"))
    time("collapse: reps groupBy")(reps0)
    time("collapse: members join") {
      keyed.select(col("id"), col("__dg"))
        .join(reps0.select(col("__dg"), col("grp")), "__dg")
        .select(col("id"), col("grp"))
    }
    val reps = reps0.select(col("grp"), col("text"))
    val sets = reps.select(col("grp").as("id"),
      NearDup.hashedShingles(col("text"), 3).as("hsh"))
      .where(size(col("hsh")) > 0)
    time("sets (hashed shingles over reps)")(sets)
    val freq = sets.select(explode(col("hsh")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("__f"))
    time("freq")(freq)
    val threshold = 0.5
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("__f"), col("h"))
    val prefixes = sets
      .select(col("id"), size(col("hsh")).as("__sz"),
        explode(col("hsh")).as("h"))
      .join(freq, "h")
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= greatest(lit(1), col("__sz") -
        ceil(lit(threshold) * col("__sz") - lit(1e-9)).cast("int") + lit(1)))
      .select(col("id").as("id_a"), col("__sz").as("__sza"), col("h"))
    time("prefixes (freq join + window)")(prefixes)
    val candidates = prefixes
      .join(sets.select(col("id").as("id_b"),
          size(col("hsh")).as("__szb"), explode(col("hsh")).as("h")), "h")
      .where(col("id_a") < col("id_b"))
      .where(least(col("__sza"), col("__szb")).cast("double") /
        greatest(col("__sza"), col("__szb")).cast("double") >= threshold)
      .select(col("id_a"), col("id_b")).distinct()
    time("candidates (join+lenfilter+distinct)")(candidates)
    println("candidate rows: " + candidates.count())
    val confirm = candidates
      .join(sets.select(col("id").as("id_a"), col("hsh").as("__ha")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("hsh").as("__hb")), "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__ha"), col("__hb"))).as("__ix"),
        (size(col("__ha")) + size(col("__hb"))).as("__sum"))
      .select(col("id_a"), col("id_b"),
        (col("__ix").cast("double") /
          (col("__sum") - col("__ix")).cast("double")).as("__j"))
      .where(col("__j") >= threshold)
    time("confirm (2 joins + intersect)")(confirm)
    spark.stop()
  }
}
