package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Rfm

class RfmSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("segments: fixed-threshold tiers on floor-day recency, counts, decimal sums") {
    import spark.implicits._
    val ref = ts("2024-02-01 00:00:00").getTime
    val df = Seq(
      // champion: bought yesterday, 3×, 900 total
      (1L, ts("2024-01-31 10:00:00"), "purchase", 300.0),
      (1L, ts("2024-01-30 10:00:00"), "purchase", 300.0),
      (1L, ts("2024-01-29 10:00:00"), "purchase", 300.0),
      // hibernating: one old small purchase
      (2L, ts("2024-01-10 10:00:00"), "purchase", 10.0),
      // non-conversions never count
      (3L, ts("2024-01-31 10:00:00"), "view", 999.0))
      .toDF("user_id", "ts", "event_type", "value")
    val out = Rfm.segments(df, "user_id", "ts", "event_type", "value",
        convType = "purchase", refMs = ref, rDays = (2, 10),
        fCounts = (3L, 2L), mValues = (500.0, 100.0))
      .as[(Int, Int, Int, Long, Double)].collect().toSet
    // user1: rdays=0 (<2 → 1), f=3 (→1), m=900 (→1)
    // user2: rdays=21 (→3), f=1 (→3), m=10 (→3)
    assert(out == Set((1, 1, 1, 1L, 900.0), (3, 3, 3, 1L, 10.0)))
  }

  test("recency tier boundary is exact floor-days against the reference") {
    import spark.implicits._
    val ref = ts("2024-02-01 00:00:00").getTime
    val df = Seq(
      (1L, ts("2024-01-30 00:00:01"), "purchase", 1.0),  // 1.99d → floor 1
      (2L, ts("2024-01-30 00:00:00"), "purchase", 1.0))  // exactly 2d → 2
      .toDF("user_id", "ts", "event_type", "value")
    val out = Rfm.segments(df, "user_id", "ts", "event_type", "value",
        "purchase", ref, rDays = (2, 10), fCounts = (9L, 8L),
        mValues = (9.0, 8.0))
      .as[(Int, Int, Int, Long, Double)].collect()
      .map(r => (r._1, r._4)).toMap
    assert(out == Map(1 -> 1L, 2 -> 1L)) // tiers 1 and 2 get one user each
  }
}
