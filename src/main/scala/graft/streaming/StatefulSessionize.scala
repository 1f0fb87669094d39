package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import scala.collection.mutable.ArrayBuffer

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * custom per-key state the built-in windowed aggregates cannot express
  * (SURVEY.md §2.7 extension; the batch twin is the lag+cumsum
  * `events_sessionize` query).
  *
  * Semantics (identical to the batch operator): events of one user belong
  * to one session while consecutive gaps are <= 30 minutes, compared in
  * integer MICROSECONDS; a larger gap closes the session and starts the
  * next.
  *
  * Scale/state contract:
  *   - State per key is ONE open session (4 numbers), not the event
  *     history — O(active users), independent of stream length.
  *   - A session is emitted inline the moment a same-user event proves the
  *     gap, or by EVENT-TIME TIMEOUT once the watermark passes
  *     last_event + gap — so idle users' sessions drain instead of pinning
  *     state forever.
  *   - Ordering contract: events are sorted (ts, event_id) within each
  *     micro-batch invocation; across batches the watermark bounds disorder
  *     (an event older than the watermark may be attributed to a later
  *     session — the standard streaming-sessionization tradeoff).
  */
object StatefulSessionize {

  final case class SessionEvent(event_id: Long, ts: java.sql.Timestamp,
                                user_id: Long, value: Double)

  /** The whole per-key state: the one open session. */
  final case class OpenSession(startUs: Long, lastUs: Long,
                               nEvents: Long, sumValue: Double)

  final case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                              n_events: Long, session_value: Double)

  val DefaultGapUs: Long = 1800L * 1000000L

  /** Epoch micros of a Timestamp (getTime floors to millis; nanos carries
    * the sub-second remainder). */
  private def us(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  private def toOut(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId,
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(s.startUs, 1000000L),
        Math.floorMod(s.startUs, 1000000L) * 1000L)),
      s.nEvents, s.sumValue)

  /** The fold: emit sessions closed by this batch's events; keep the open
    * one in state. `finalizeOpen` (batch mode only, where timeouts never
    * fire) also emits the trailing open session. */
  private def foldEvents(userId: Long, events: Iterator[SessionEvent],
                         state: GroupState[OpenSession], gapUs: Long,
                         finalizeOpen: Boolean): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      // watermark passed last_event + gap with no new events: drain.
      val out = state.getOption.map(toOut(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toArray.sortBy(e => (us(e.ts), e.event_id))
    val closed = ArrayBuffer.empty[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      val t = us(e.ts)
      cur match {
        case Some(s) if t - s.lastUs <= gapUs =>
          cur = Some(OpenSession(s.startUs, t, s.nEvents + 1, s.sumValue + e.value))
        case Some(s) =>
          closed += toOut(userId, s)
          cur = Some(OpenSession(t, t, 1L, e.value))
        case None =>
          cur = Some(OpenSession(t, t, 1L, e.value))
      }
    }
    cur.foreach { s =>
      if (finalizeOpen) closed += toOut(userId, s)
      else {
        state.update(s)
        // fire once the event-time watermark passes the session's horizon
        state.setTimeoutTimestamp(s.lastUs / 1000L + gapUs / 1000L)
      }
    }
    closed.iterator
  }

  /** Streaming entry: watermarked, append-mode, event-time timeouts.
    * Input must already carry the watermark (the caller picks the late-data
    * tolerance; tests use `withWatermark("ts", ...)`). */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapUs: Long = DefaultGapUs): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: Long, it: Iterator[SessionEvent], st: GroupState[OpenSession]) =>
          foldEvents(k, it, st, gapUs, finalizeOpen = false))
  }

  /** Batch entry: same fold over a bounded Dataset (each key's full
    * history arrives as one iterator; the trailing open session is
    * finalized since no timeout will ever fire). Exists so the ORACLE can
    * check the typed fold against the SQL window formulation.
    *
    * Memory contract: the fold sorts one key's batch-iterator in memory,
    * so THIS entry holds a user's whole history per task — fine for the
    * oracle's bounded corpus, but batch sessionization at 100 TB should
    * use the lag+cumsum window formulation (events_sessionize), which
    * sort-spills. The STREAMING entry never faces this: each invocation
    * sees one micro-batch's events per key. */
  def sessionizeBatch(events: Dataset[SessionEvent],
                      gapUs: Long = DefaultGapUs): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[OpenSession]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (k: Long, it: Iterator[SessionEvent], st: GroupState[OpenSession]) =>
          foldEvents(k, it, st, gapUs, finalizeOpen = true))
  }
}
