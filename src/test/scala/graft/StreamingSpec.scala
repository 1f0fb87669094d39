package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingIngest

class StreamingSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    (1L, ts("2026-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
    (2L, ts("2026-01-01 10:45:00"), 2L, "click", 2.0, "{}"),
    (3L, ts("2026-01-01 11:05:00"), 1L, "view", 3.0, "{}"),
  ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("windowed aggregate: identical results in batch mode") {
    val got = StreamingIngest.windowedEventCounts(events)
      .orderBy("window_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (ts("2026-01-01 10:00:00"), "click", 2L, 3.0),
      (ts("2026-01-01 11:00:00"), "view", 1L, 3.0)))
  }

  test("windowed aggregate over a MemoryStream micro-batch run") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double, String)]
    val streamDf = mem.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val q = StreamingIngest.windowedEventCountsStream(streamDf)
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      mem.addData((1L, ts("2026-01-01 10:05:00"), 1L, "click", 1.0, "{}"),
        (2L, ts("2026-01-01 10:45:00"), 2L, "click", 2.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("win_agg").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq((ts("2026-01-01 10:00:00"), "click", 2L, 3.0)))
    } finally q.stop()
  }

  test("upsertBatch is idempotent on event_id (at-least-once -> no dupes)") {
    val sink = java.nio.file.Files.createTempDirectory("graft-sink").toString + "/events"
    StreamingIngest.upsertBatch(events, sink)
    StreamingIngest.upsertBatch(events, sink) // redelivery
    val extra = Seq((4L, ts("2026-01-01 12:00:00"), 3L, "click", 4.0, "{}"),
      (4L, ts("2026-01-01 12:00:00"), 3L, "click", 4.0, "{}")) // in-batch dup
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    StreamingIngest.upsertBatch(extra, sink)
    val got = spark.read.parquet(sink)
    assert(got.count() == 4)
    assert(got.select("event_id").distinct().count() == 4)
  }

  test("upsert anti-join reads ONLY the batch's date partitions " +
    "(bounded re-read on an unbounded sink)") {
    val sink = java.nio.file.Files.createTempDirectory("graft-sink-pruned")
      .toString + "/events"
    def batch(rows: Seq[(Long, Timestamp, Long, String, Double, String)]) =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // three micro-batches over three distinct days
    StreamingIngest.upsertBatch(batch(Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L, "click", 1.0, "{}"),
      (2L, ts("2026-01-01 11:00:00"), 1L, "view", 1.0, "{}"))), sink)
    StreamingIngest.upsertBatch(batch(Seq(
      (3L, ts("2026-01-02 10:00:00"), 2L, "click", 1.0, "{}"))), sink)
    StreamingIngest.upsertBatch(batch(Seq(
      (4L, ts("2026-01-03 10:00:00"), 3L, "click", 1.0, "{}"),
      (3L, ts("2026-01-02 10:00:00"), 2L, "click", 1.0, "{}"))), sink) // redelivered
    val got = spark.read.parquet(sink)
    assert(got.count() == 4) // redelivery of event 3 did not double-insert
    // the pruned read for a single-date batch touches only that partition:
    // count the files the executed scan ACTUALLY selected (inputFiles
    // reports the relation pre-pruning, so it cannot be used here)
    val pruned = StreamingIngest.sinkIdsForDates(spark, sink,
      Seq(java.sql.Date.valueOf("2026-01-02")))
    pruned.collect()
    val scan = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    val scannedFiles = scan.metrics("numFiles").value
    val allFiles = spark.read.parquet(sink).inputFiles.length
    assert(scannedFiles >= 1 && scannedFiles < allFiles,
      s"scan read $scannedFiles of $allFiles files — not pruned")
    assert(scan.toString.contains("PartitionFilters"))
  }
}
