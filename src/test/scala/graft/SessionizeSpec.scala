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

  test("topPaths: sessions truncate to maxSteps, counts rank, path breaks ties") {
    import spark.implicits._
    val rows = Seq(
      // user 1, one session of four events → path truncates to 3 steps
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:00:10"), 2L, "b"),
      (1L, ts("2024-01-01 10:00:20"), 3L, "c"),
      (1L, ts("2024-01-01 10:00:30"), 4L, "d"),
      // user 2: two sessions (1h gap), both "a > b"
      (2L, ts("2024-01-01 09:00:00"), 5L, "a"),
      (2L, ts("2024-01-01 09:00:05"), 6L, "b"),
      (2L, ts("2024-01-01 11:00:00"), 7L, "a"),
      (2L, ts("2024-01-01 11:00:05"), 8L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Sessionize.topPaths(rows, "user_id", "ts", "event_id",
        "event_type", gapMs = 30L * 60 * 1000, maxSteps = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a > b", 2L), ("a > b > c", 1L)))
  }
}
