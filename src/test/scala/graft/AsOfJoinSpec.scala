package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right at-or-before, per key, left-join nulls") {
    val left = Seq(
      (10L, 1L, ts("2026-01-01 10:00:00")), // exact tie with right r2
      (11L, 1L, ts("2026-01-01 11:00:00")), // between r2 and r3 -> r2
      (12L, 2L, ts("2026-01-01 09:00:00")), // no prior right for key 2
      (13L, 2L, ts("2026-01-01 12:00:00"))  // after r4 -> r4
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, ts("2026-01-01 09:00:00")),
      (2L, 1L, ts("2026-01-01 10:00:00")),
      (3L, 1L, ts("2026-01-01 11:30:00")),
      (4L, 2L, ts("2026-01-01 10:00:00"))
    ).toDF("click_id", "user_id", "click_ts")
    val got = AsOfJoin.backward(left, right, "user_id", "ts", "click_ts",
        Seq("click_id", "click_ts"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (10L, Some(2L)), // right row AT left ts matches (>= semantics)
      (11L, Some(2L)),
      (12L, None),     // left-join: survives with null payload
      (13L, Some(4L))))
  }

  test("plan: one partitioned window, no range join blowup") {
    val left = Seq((1L, 1L, ts("2026-01-01 10:00:00"))).toDF("id", "k", "ts")
    val right = Seq((2L, 1L, ts("2026-01-01 09:00:00"))).toDF("rid", "k", "rts")
    val p = AsOfJoin.backward(left, right, "k", "ts", "rts", Seq("rid"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("hashpartitioning(__key"))
  }
}
