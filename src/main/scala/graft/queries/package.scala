package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** Driver contract: (session, sf-dir) => result DataFrame. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** Load one driver-generated test table (TESTDATA.md). */
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table with `ts` normalized to TimestampType, whatever the
    * parquet's physical representation. The driver has generated this
    * table with two different types across rounds: TIMESTAMP(MICROS)
    * (reads as TIMESTAMP_NTZ — cast to TIMESTAMP via the UTC-pinned
    * session, the same naive-means-UTC reading DuckDB applies) and
    * TIMESTAMP(NANOS) (Spark reads it only as a long with
    * `spark.sql.legacy.parquet.nanosAsLong` — truncate to micros exactly
    * like DuckDB's nanos->micros coercion). Detecting from the schema
    * keeps every events query working against either generation, and the
    * legacy conf is only ever touched on the nanos path (where execution
    * needs it), not leaked onto the session for current data. */
  def eventsTable(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    def normalize(df: DataFrame): DataFrame = df.schema("ts").dataType match {
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
    try normalize(table(s, dir, "events"))
    catch {
      case _: org.apache.spark.SparkException |
           _: org.apache.spark.sql.AnalysisException =>
        // TIMESTAMP(NANOS) parquet: only readable as long nanos
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        normalize(table(s, dir, "events"))
    }
  }

  /** A named query together with its DuckDB oracle SQL (None => the driver
    * records a weaker rows-only check). */
  final case class Q(name: String, fn: QueryFn, oracle: Option[String])
}
