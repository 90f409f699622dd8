package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnel requires steps in order: out-of-order users don't convert") {
    import spark.implicits._
    val df = Seq(
      // user 1: A then B — full conversion
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-01 00:01:00"), "B"),
      // user 2: B before A — converts step 1 only (B never re-occurs)
      (2L, ts("2024-01-01 00:00:00"), "B"),
      (2L, ts("2024-01-01 00:01:00"), "A"),
      // user 3: A only
      (3L, ts("2024-01-01 00:00:00"), "A"))
      .toDF("user_id", "ts", "event_type")
    val counts = Funnel.stepCounts(df, "user_id", "ts", "event_type", Seq("A", "B"))
      .as[(Int, String, Long)].collect().toSet
    assert(counts == Set((1, "A", 3L), (2, "B", 1L)))
  }

  test("same-timestamp step events count (>= boundary, like the reference's inclusive bounds)") {
    import spark.implicits._
    val t0 = ts("2024-01-01 00:00:00")
    val df = Seq((1L, t0, "A"), (1L, t0, "B"))
      .toDF("user_id", "ts", "event_type")
    val counts = Funnel.stepCounts(df, "user_id", "ts", "event_type", Seq("A", "B"))
      .as[(Int, String, Long)].collect().toSet
    assert(counts == Set((1, "A", 1L), (2, "B", 1L)))
  }
}
