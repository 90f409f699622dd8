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

  test("stepLatency: exact ms diffs of the fold's chain, converted users only") {
    import spark.implicits._
    val df = Seq(
      // user 1: view@0 → click@+60s → purchase@+300s
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 00:01:00"), "click"),
      (1L, ts("2024-01-01 00:05:00"), "purchase"),
      // user 2: view@0 → click@+180s, never purchases
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:03:00"), "click"),
      // user 3: click only — reaches no transition
      (3L, ts("2024-01-01 00:00:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val out = Funnel.stepLatency(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // step 2 latencies: {60000, 180000} → p50 = 120000 (interpolated),
    // p90 = 168000; step 3: {240000} alone
    assert(out(2) == ((2L, 120000.0, 168000.0)))
    assert(out(3) == ((1L, 240000.0, 240000.0)))
    assert(!out.contains(1))
  }

  test("fold semantics match chained min-after-previous joins on interleaved events") {
    import spark.implicits._
    val df = Seq(
      // user 1: click before any view doesn't count; conversion is
      // view@01:00 → click@03:00 → purchase@04:00
      (1L, ts("2024-01-01 00:00:00"), "click"),
      (1L, ts("2024-01-01 01:00:00"), "view"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"), // before click time → ignored
      (1L, ts("2024-01-01 03:00:00"), "click"),
      (1L, ts("2024-01-01 04:00:00"), "purchase"),
      // user 2: stops after click
      (2L, ts("2024-01-01 00:00:00"), "view"),
      (2L, ts("2024-01-01 00:30:00"), "click"))
      .toDF("user_id", "ts", "event_type")
    val conv = Funnel.conversionTimes(df, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .as[(Long, Timestamp, Timestamp, Timestamp)].collect()
      .map { case (u, t1, t2, t3) => u -> ((t1, t2, t3)) }.toMap
    assert(conv(1L) == (ts("2024-01-01 01:00:00"), ts("2024-01-01 03:00:00"),
      ts("2024-01-01 04:00:00")))
    assert(conv(2L) == (ts("2024-01-01 00:00:00"), ts("2024-01-01 00:30:00"), null))
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
