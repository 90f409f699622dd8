package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Retention

class RetentionSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("weekly cohorts: offset 0 always present; returners counted once per week") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // Mon wk0 cohort
      (1L, ts("2024-01-03 10:00:00")),  // same week → still offset 0, distinct
      (1L, ts("2024-01-10 10:00:00")),  // wk1 → offset 1
      (2L, ts("2024-01-02 10:00:00")),  // wk0 cohort, never returns
      (3L, ts("2024-01-09 10:00:00")))  // wk1 cohort
      .toDF("user_id", "ts")
    val out = Retention.weeklyCohorts(df, "user_id", "ts")
      .select("cohort_week", "week_offset", "n_users")
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(out == Set(
      (ts("2024-01-01 00:00:00"), 0L, 2L),  // users 1,2 in wk0 cohort
      (ts("2024-01-01 00:00:00"), 1L, 1L),  // user 1 returns
      (ts("2024-01-08 00:00:00"), 0L, 1L))) // user 3 wk1 cohort
  }
}
