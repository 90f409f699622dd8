package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventStats

/** Event-stream profiling semantics: pivot cell/zero-fill/listed-total
  * behavior, trailing-window z-scores (current day excluded, partial
  * windows dropped), and schema'd JSON property extraction including the
  * malformed/float/missing-key NULL postures the DuckDB oracle regex must
  * mirror. Oracle hash-parity is gated by tools/check_oracle.py.
  */
class EventStatsSpec extends AnyFunSuite with SparkTestBase {

  private def ts(day: Int, h: Int = 1) =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  test("pivotDaily: zero-fills empty cells; total counts listed types only") {
    import spark.implicits._
    val rows = Seq(
      ("click", ts(1)), ("click", ts(1)), ("view", ts(1)),
      ("error", ts(1)),                    // unlisted -> excluded everywhere
      ("view", ts(2)))
    val out = EventStats.pivotDaily(rows.toDF("event_type", "ts"), "ts",
        "event_type", Seq("click", "view"))
      .as[(java.sql.Date, Long, Long, Long)].collect()
      .map(r => r._1.toString -> ((r._2, r._3, r._4))).toMap
    assert(out("2024-01-01") == ((2L, 1L, 3L)))  // error not in total
    assert(out("2024-01-02") == ((0L, 1L, 1L)))  // click cell zero-filled
  }

  test("dailyAcf: alternating series has acf -1 at lag 1 and +1 at lag 2") {
    import spark.implicits._
    // daily counts 1,2,1,2,1,2 (day i gets i%2+1 events)
    val rows = for (d <- 1 to 6; _ <- 1 to (d % 2 + 1))
      yield ("a", ts(d))
    val out = EventStats.dailyAcf(rows.toDF("event_type", "ts"), "ts",
        "event_type", maxLag = 2)
      .as[(String, Int, Long, Option[Double])].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(out(1) == ((5L, Some(-1.0))))
    assert(out(2) == ((4L, Some(1.0))))
  }

  test("dailyCrossCorr: a shifted copy peaks at its lead; negative lags mirror") {
    import spark.implicits._
    // B = A shifted forward 1 day, A = 1,2,1,2,... → xcorr(lag=1) = 1,
    // xcorr(lag=-1) = 1 (2-periodic), xcorr(0) = -1 (anti-phase).
    val rows =
      (for (d <- 1 to 6; _ <- 1 to (d % 2 + 1)) yield ("a", ts(d))) ++
      (for (d <- 2 to 7; _ <- 1 to ((d - 1) % 2 + 1)) yield ("b", ts(d)))
    val out = EventStats.dailyCrossCorr(rows.toDF("event_type", "ts"), "ts",
        "event_type", "a", "b", maxLag = 1)
      .as[(Int, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3).toMap
    assert(out(1) == Some(1.0))
    assert(out(0) == Some(-1.0))
    assert(out(-1) == Some(1.0))
  }

  test("dailyAcf: zero variance or missing shifted days yield null/no pair") {
    import spark.implicits._
    // constant series → zero variance → null; gap breaks pairing
    val rows = Seq(("c", ts(1)), ("c", ts(2)), ("c", ts(4)))
    val out = EventStats.dailyAcf(rows.toDF("event_type", "ts"), "ts",
        "event_type", maxLag = 1)
      .as[(String, Int, Long, Option[Double])].collect()
    // pairs: (1,2) and... day 3 missing so (2,3)/(3,4) absent → 1 pair
    assert(out.toSeq == Seq(("c", 1, 1L, None)))
  }

  test("anomalyZscores: full-window days only, today excluded from baseline") {
    import spark.implicits._
    // Baseline days 1..7 alternate 1,2 events; day 8 spikes to 10.
    val counts = Seq(1, 2, 1, 2, 1, 2, 1)
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map(k => ("a", ts(i + 1, k)))
    } ++ (1 to 10).map(k => ("a", ts(8, k)))
    val out = EventStats.anomalyZscores(rows.toDF("event_type", "ts"), "ts",
        "event_type", win = 7)
      .as[(String, java.sql.Date, Long, Double)].collect()
    // Days 1..7 lack a full trailing window; only day 8 scores.
    assert(out.map(_._2.toString).toSeq == Seq("2024-01-08"))
    val s1 = counts.sum.toDouble; val s2 = counts.map(c => c * c).sum.toDouble
    val mean = s1 / 7; val variance = (s2 - s1 * s1 / 7) / 6
    val expected = BigDecimal((10.0 - mean) / math.sqrt(variance))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.head._4 == expected)
  }

  test("anomalyZscores: zero-variance baselines are dropped, not div-by-zero") {
    import spark.implicits._
    val rows = (1 to 8).map(d => ("a", ts(d)))  // constant 1/day
    val out = EventStats.anomalyZscores(rows.toDF("event_type", "ts"), "ts",
      "event_type", win = 7).collect()
    assert(out.isEmpty)
  }

  test("jsonPropStats: ints parse; floats, missing keys, malformed -> NULL") {
    import spark.implicits._
    val rows = Seq(
      ("a", """{"k": 5}"""),
      ("a", """{"k": -3}"""),
      ("a", """{"k": 5.5}"""),     // float under BIGINT schema -> NULL
      ("a", """{"j": 1}"""),       // missing key -> NULL
      ("b", """not json"""),       // malformed -> NULL
      ("b", """{"k": 7}"""))
    val out = EventStats.jsonPropStats(rows.toDF("event_type", "props"),
        "props", "event_type")
      .as[(String, Long, Long, Option[Long], Option[Long], Option[Long], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, 2L, Some(2L), Some(-3L), Some(5L), Some(1.0))))
    assert(out("b") == (("b", 2L, 1L, Some(7L), Some(7L), Some(7L), Some(7.0))))
  }

  test("oracle fixture constraint holds: every props payload is flat {\"k\": int}") {
    // The DuckDB oracle extracts k by regex, which matches the schema'd
    // parse ONLY for flat single-key integer payloads — assert the real
    // events fixture satisfies that, so q_event_props parity is sound.
    val bad = Tables.load(spark, sf, "events")
      .filter(!org.apache.spark.sql.functions.col("props")
        .rlike("""^\{"k":\s*-?[0-9]+\}$"""))
      .count()
    assert(bad == 0L)
  }

  test("ewmaDaily: hand-checked recurrence, first day seeds, gaps carry state") {
    import spark.implicits._
    // counts 1, 2, 3 on days 1, 2, 4 with α = 0.5:
    // y1 = 1; y2 = 0.5·2 + 0.5·1 = 1.5; y4 = 0.5·3 + 0.5·1.5 = 2.25
    // (the day-3 gap does NOT decay state — EWMA is per-observation)
    val rows = Seq(("g", ts(1))) ++ (1 to 2).map(_ => ("g", ts(2))) ++
      (1 to 3).map(_ => ("g", ts(4)))
    val out = EventStats.ewmaDaily(rows.toDF("event_type", "ts"), "ts",
        "event_type", alpha = 0.5)
      .collect().map(r => r.getDate(1).toString -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      "2024-01-01" -> ((1L, 1.0)),
      "2024-01-02" -> ((2L, 1.5)),
      "2024-01-04" -> ((3L, 2.25))))
  }

  test("transitions: per-user sequences, same-ts tie-break, conditional probabilities") {
    import spark.implicits._
    // user 1: a → b → a ; user 2: a → b (same second as its 'a' — the
    // event_id tie-break orders them); cross-user pairs must NOT count
    val rows = Seq(
      (1L, 10L, "a", ts(1, 1)), (1L, 11L, "b", ts(1, 2)), (1L, 12L, "a", ts(1, 3)),
      (2L, 20L, "a", ts(2, 1)), (2L, 21L, "b", ts(2, 1)))
      .toDF("user_id", "event_id", "event_type", "ts")
    val out = EventStats.transitions(rows, "ts", "event_type", "user_id", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out == Map(
      ("a", "b") -> ((2L, 1.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("trendFit: exact recovery of a perfect linear series; single-day types fit nothing") {
    import spark.implicits._
    // 'grow': days 1..5 with 1,2,3,4,5 events → y = x + 1 on the
    // 0-based day index (slope 1, intercept 1), recovered EXACTLY
    // because all moments are integers. 'spike': one day → zero
    // denominator → NULL coefficients, n_days still reported.
    val rows = (1 to 5).flatMap(d => (1 to d).map(_ => ("grow", ts(d)))) ++
      Seq(("spike", ts(3)), ("spike", ts(3)))
    val out = EventStats.trendFit(rows.toDF("event_type", "ts"), "ts", "event_type")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3))))).toMap
    assert(out("grow")._1 == 5L)
    assert(out("grow")._2.contains(1.0) && out("grow")._3.contains(1.0))
    assert(out("spike")._1 == 1L)
    assert(out("spike")._2.isEmpty && out("spike")._3.isEmpty)
  }

  test("cusumDaily: integer recurrence accumulates a level shift and flags past h") {
    import spark.implicits._
    // counts: 1,1,1,3,3 -> mean_micro = (9*1e6) div 5 = 1_800_000
    // k=0: s = max(0, prev + n*1e6 - mu): -0.8,-0.8,-0.8,+1.2,+1.2 accum
    // s: 0, 0, 0, 1_200_000, 2_400_000 -> flags at h=2_000_000: last day
    val rows = for (d <- 1 to 5; _ <- 1 to (if (d >= 4) 3 else 1))
      yield ("a", ts(d))
    val out = EventStats.cusumDaily(rows.toDF("event_type", "ts"), "ts",
        "event_type", kMicro = 0L, hMicro = 2000000L)
      .as[(String, java.sql.Date, Long, Double, Boolean)].collect()
      .sortBy(_._2.toString)
    assert(out.map(_._4).toSeq == Seq(0.0, 0.0, 0.0, 1.2, 2.4))
    assert(out.map(_._5).toSeq == Seq(false, false, false, false, true))
  }

  test("theilSen: pairwise-slope median shrugs off the outlier day least-squares would chase") {
    import spark.implicits._
    // counts 1,2,3,4,100 over days 1..5: six of ten pairwise slopes
    // are exactly 1 → median 1.0 despite the 25× final-day spike.
    val rows = for (d <- 1 to 5;
                    _ <- 1 to Seq(1, 2, 3, 4, 100)(d - 1)) yield ("g", ts(d))
    val out = EventStats.theilSen(rows.toDF("event_type", "ts"), "ts",
        "event_type")
      .as[(String, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(("g", 5L, 10L, 1.0)))
  }

  test("weeklySeasonality: dow-determined series scores 1.0; constant series NULL with peak dow 0") {
    import spark.implicits._
    // 2024-01-01 is a Monday. 'w': day d count = (d mod 7) + 1 over two
    // weeks — every dow constant across weeks (within-variance 0) →
    // strength exactly 1.0, peak at dow 6 (count 7). 'c': constant 3 →
    // SS_total = 0 → NULL strength, all means tie → earliest dow wins.
    val rows =
      (for (d <- 1 to 14; _ <- 1 to (d % 7) + 1) yield ("w", ts(d))) ++
      (for (d <- 1 to 14; _ <- 1 to 3) yield ("c", ts(d)))
    val out = EventStats.weeklySeasonality(rows.toDF("event_type", "ts"),
        "ts", "event_type")
      .as[(String, Long, Int, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("w") == ((14L, 6, Some(1.0))))
    assert(out("c") == ((14L, 0, None)))
  }

  test("madOutliers: median/MAD flag the wild day the mean-based baseline would absorb") {
    import spark.implicits._
    // 'a': daily counts 1,1,2,2,100 -> med=2, dev=(1,1,0,0,98), mad=1
    //      threshold 3*1.4826*1 = 4.4478 -> only the 98-dev day flags.
    // 'b': constant 3,3,3 -> mad=0 -> threshold 0 -> nothing flags
    //      (dev > 0 strict keeps the degenerate series quiet).
    val rows =
      (for (d <- 1 to 5; _ <- 1 to (Seq(1, 1, 2, 2, 100)(d - 1)))
        yield ("a", ts(d))) ++
      (for (d <- 1 to 3; _ <- 1 to 3) yield ("b", ts(d)))
    val out = EventStats.madOutliers(rows.toDF("event_type", "ts"), "ts",
        "event_type")
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("a") == ((5L, 2.0, 1.0, 1L)))
    assert(out("b") == ((3L, 3.0, 0.0, 0L)))
  }

  test("holtDaily: hand recurrence — level+trend co-evolve, forecast leads the trend") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // Daily counts 10, 20, 20 (α=0.5, β=0.3):
    //   d1: l=10, b=0;  d2: l=15, b=1.5;  d3: l=18.25, b=2.025.
    val rows = (1 to 10).map(i => ("a", s"2024-01-01 00:$i:00")) ++
      (1 to 20).map(i => ("a", s"2024-01-02 00:$i:00")) ++
      (1 to 20).map(i => ("a", s"2024-01-03 00:$i:00"))
    val df = rows.toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val out = graft.operators.EventStats
      .holtDaily(df, "ts", "event_type", alpha = 0.5, beta = 0.3)
      .as[(String, java.sql.Date, Long, Double, Double, Double)]
      .collect().sortBy(_._2.toString)
    assert(out.map(r => (r._3, r._4, r._5, r._6)).toSeq == Seq(
      (10L, 10.0, 0.0, 10.0),
      (20L, 15.0, 1.5, 16.5),
      (20L, 18.25, 2.025, 20.275)))
  }

  test("circadianProfile: rush hour scores 1, opposite peaks score 0, ties pick the earliest hour") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    val rows =
      (1 to 4).map(i => ("a", s"2024-01-0$i 06:00:00")) ++      // one rush hour
      Seq(("b", "2024-01-01 00:00:00"), ("b", "2024-01-01 12:00:00"),
          ("b", "2024-01-02 00:30:00"), ("b", "2024-01-02 12:30:00")) // antipodal
    val df = rows.toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val out = graft.operators.EventStats.circadianProfile(df, "ts", "event_type")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, 6L, 4L, 1.0)))
    // two exactly opposite peaks cancel: R = 0; peak ties → hour 0.
    assert(out("b") == (("b", 4L, 0L, 2L, 0.0)))
  }

  test("dailyPacf: hand Durbin–Levinson on a period-4 series; short-series guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    // Daily counts 10,20,30,20,10,20,30,20,10,20 (period 4): strong
    // negative lag-2 structure. Hand-run of the exact-moment recursion:
    // acf = (−0.002041, −0.8, −0.006122); pacf = (−0.002041,
    // −0.800007, −0.029706).
    val counts = Seq(10, 20, 30, 20, 10, 20, 30, 20, 10, 20)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (1 to c).map(i => ("a", f"2024-01-${d + 1}%02d 00:${i % 60}%02d:${i / 60}%02d"))
    }
    val df = rows.toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val out = graft.operators.EventStats.dailyPacf(df, "ts", "event_type",
      maxLag = 3)
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3, r._4)).toSeq == Seq(
      (1L, Some(-0.002041), Some(-0.002041)),
      (2L, Some(-0.8), Some(-0.800007)),
      (3L, Some(-0.006122), Some(-0.029706))))

    // Two days only: lag 1 defined, lags ≥ 2 NULL (n ≤ k).
    val short = Seq(("b", "2024-01-01 00:00:00"), ("b", "2024-01-02 00:00:00"),
      ("b", "2024-01-02 00:01:00")).toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))
    val so = graft.operators.EventStats.dailyPacf(short, "ts", "event_type",
      maxLag = 3)
      .as[(String, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._2)
    // n=2, counts (1,2): r1 = (4·2 − 2·3·3 + 1·9)/(4·5 − 2·9) = −0.5.
    assert(so(0)._3.contains(-0.5) && so(1)._3.isEmpty && so(2)._4.isEmpty)
  }

  test("trimmedStats: partial inclusion at cut ranks, outlier clamping, trim 0") {
    import spark.implicits._
    // [1,1,1,2,3,4,100] at 20% → tl=1, kept ranks [1,6):
    // trimmed = (1·2 + 2 + 3 + 4)/5 = 2.2 (the duplicate value 1 is
    // PARTIALLY kept — 2 of its 3 rows); winsorized = (11 + 1 + 4)/7;
    // the 100 outlier clamps to hi_cut 4.
    val df = (Seq(1.0, 1.0, 1.0, 2.0, 3.0, 4.0, 100.0).map(("a", _))
      ++ Seq(5.0).map(("b", _))).toDF("g", "v")
    val r = graft.operators.EventStats.trimmedStats(df, "g", "v", trimPct = 20)
      .as[(String, Long, Long, Option[Double], Option[Double], Double,
           Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(r("a") == (("a", 7L, 5L, Some(1.0), Some(4.0), 16.0,
      Some(2.2), Some(2.285714))))
    // Single row: tl = 0, every estimate collapses to the value.
    assert(r("b") == (("b", 1L, 1L, Some(5.0), Some(5.0), 5.0,
      Some(5.0), Some(5.0))))

    // trim 0 keeps everything: all three means equal.
    val rz = graft.operators.EventStats.trimmedStats(df, "g", "v", trimPct = 0)
      .as[(String, Long, Long, Option[Double], Option[Double], Double,
           Option[Double], Option[Double])]
      .collect().map(x => x._1 -> x).toMap
    assert(rz("a")._6 == 16.0 && rz("a")._7.contains(16.0)
      && rz("a")._8.contains(16.0))
  }

  test("fanoDaily: hand-worked dispersion; constant series reads 0; bursty reads > 1") {
    import spark.implicits._
    // 'a': daily counts 2, 4 → mean 3, pop var 1 → F = 1/3.
    // 'b': constant 3,3,3 → F = 0 (regular, sub-Poisson limit).
    // 'c': counts 1,1,10 → mean 4, var 18 → F = 4.5 (bursty).
    val rows =
      (for (d <- 1 to 2; _ <- 1 to Seq(2, 4)(d - 1)) yield ("a", ts(d))) ++
      (for (d <- 1 to 3; _ <- 1 to 3) yield ("b", ts(d))) ++
      (for (d <- 1 to 3; _ <- 1 to Seq(1, 1, 10)(d - 1)) yield ("c", ts(d)))
    val out = EventStats.fanoDaily(rows.toDF("event_type", "ts"), "ts",
        "event_type")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("a") == ((2L, 6L, 0.333333)))
    assert(out("b") == ((3L, 9L, 0.0)))
    assert(out("c") == ((3L, 12L, 4.5)))
  }
}
