package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Sessionize

class SessionizeSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split on gaps > gapMs and roll up per session") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
      (1L, ts("2024-01-01 00:10:00"), 11L, 2.0),   // same session (10 min)
      (1L, ts("2024-01-01 01:00:00"), 12L, 3.0),   // 50 min gap → new session
      (2L, ts("2024-01-01 00:05:00"), 13L, 4.0))   // other user
      .toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessions(df, "user_id", "ts", "event_id", "value",
        gapMs = 30L * 60 * 1000)
      .select("user_id", "session_idx", "n_events", "total_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set((1L, 0L, 2L, 3.0), (1L, 1L, 1L, 3.0), (2L, 0L, 1L, 4.0)))
  }

  test("ties on timestamp are ordered by the tie-breaker (stable sessions)") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1L, t0, 2L, 1.0), (1L, t0, 1L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val idx = Sessionize.withSessionIdx(df, "user_id", "ts", "event_id",
        gapMs = 1000)
      .select("event_id", "session_idx").as[(Long, Long)].collect().toMap
    // zero gap → both in session 0 regardless of order
    assert(idx == Map(1L -> 0L, 2L -> 0L))
  }
}
