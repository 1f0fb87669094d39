package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.streaming.StreamingIngest

/** Multimodal binary-column features and the streaming windowed aggregate,
  * both oracle-checked. The binary payload is the utf-8 text (the only
  * bytes in the test corpus) — the plumbing is identical for real
  * image/audio bytes.
  */
object MultimodalQueries {

  /** Binary feature extraction: byte length, sha256, stub-decoded
    * dimensions, frame count. */
  private val mmFeatures: QueryFn = (s, dir) =>
    Multimodal.features(
        table(s, dir, "documents").withColumn("content", col("text").cast("binary")),
        col("doc_id"), col("content"), lit("text"))
      .orderBy(col("id"))

  private val mmFeaturesSql: String =
    s"""SELECT doc_id AS id, 'text' AS modality,
       |  octet_length(text::BLOB)::BIGINT AS n_bytes,
       |  sha256(text) AS sha,
       |  ((('0x' || substr(sha256(text), 1, 2))::INT & 63) + 1)::INT AS width,
       |  ((('0x' || substr(sha256(text), 3, 2))::INT & 63) + 1)::INT AS height,
       |  ceil(octet_length(text::BLOB)::DOUBLE / ${Multimodal.FrameBytes})::BIGINT AS n_frames
       |FROM documents ORDER BY id""".stripMargin

  /** Frame-sampling arithmetic: per-document frame count and total sampled
    * bytes after slicing into ${Multimodal.FrameBytes}-byte frames. */
  private val mmFrames: QueryFn = (s, dir) =>
    Multimodal.sampleFrames(
        table(s, dir, "documents").withColumn("content", col("text").cast("binary")),
        col("doc_id"), col("content"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(length(col("frame"))).as("total_bytes"))
      .orderBy(col("id"))

  private val mmFramesSql: String =
    s"""SELECT doc_id AS id,
       |  ceil(octet_length(text::BLOB)::DOUBLE / ${Multimodal.FrameBytes})::BIGINT AS n_frames,
       |  octet_length(text::BLOB)::BIGINT AS total_bytes
       |FROM documents ORDER BY id""".stripMargin

  /** Hourly windowed event aggregate (batch twin of the streaming path —
    * identical code, SURVEY.md §2.7). The events parquet stores
    * TIMESTAMP(NANOS), which Spark only reads as a long — truncate to
    * micros exactly like DuckDB's default nanos->micros coercion. */
  private val eventWindows: QueryFn = (s, dir) => {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = table(s, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    StreamingIngest.windowedEventCounts(ev)
      .orderBy(col("window_start"), col("event_type"))
  }

  private val eventWindowsSql: String =
    """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
      |  count(*) AS n_events, round(sum(value), 2) + 0 AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("multimodal_features", mmFeatures, Some(mmFeaturesSql)),
    Q("multimodal_frames", mmFrames, Some(mmFramesSql)),
    Q("streaming_window_agg", eventWindows, Some(eventWindowsSql)),
  )
}
