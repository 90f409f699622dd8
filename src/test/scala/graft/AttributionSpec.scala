package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Attribution

class AttributionSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val Day = 24L * 3600 * 1000

  private def run(rows: Seq[(Long, Timestamp, Long, String, Double)],
                  lookbackMs: Long): Map[String, (Long, Double)] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    Attribution.lastTouch(df, "user_id", "ts", "event_id", "event_type",
        "value", touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackMs = lookbackMs)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("credits the most recent touch, not the first") {
    val out = run(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 02:00:00"), 3L, "purchase", 10.0)), Day)
    assert(out == Map("click" -> ((1L, 10.0))))
  }

  test("touches outside the lookback window fall to (none)") {
    val out = run(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-03 00:00:01"), 2L, "purchase", 5.0), // 2d + 1s ago
      (2L, ts("2024-01-05 00:00:00"), 3L, "purchase", 7.0)), 2 * Day)
    assert(out == Map("(none)" -> ((2L, 12.0))))
  }

  test("touches never credit across users; later purchases re-credit the same touch") {
    val out = run(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0),
      (2L, ts("2024-01-01 00:30:00"), 2L, "purchase", 3.0), // other user
      (1L, ts("2024-01-01 01:00:00"), 3L, "purchase", 4.0),
      (1L, ts("2024-01-01 02:00:00"), 4L, "purchase", 5.0)), Day)
    assert(out == Map("click" -> ((2L, 9.0)), "(none)" -> ((1L, 3.0))))
  }

  test("same-timestamp touch counts when it sorts first on the id tie-break") {
    val out = run(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 00:00:00"), 2L, "purchase", 1.0),
      // touch id AFTER the purchase id at the same ts → not yet seen
      (2L, ts("2024-01-01 00:00:00"), 9L, "view", 0.0),
      (2L, ts("2024-01-01 00:00:00"), 8L, "purchase", 2.0)), Day)
    assert(out == Map("view" -> ((1L, 1.0)), "(none)" -> ((1L, 2.0))))
  }

  private def runLinear(rows: Seq[(Long, Timestamp, Long, String, Double)],
                        lookbackMs: Long): Map[String, (Long, Double)] = {
    import spark.implicits._
    val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
    Attribution.linearTouch(df, "user_id", "ts", "event_id", "event_type",
        "value", touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackMs = lookbackMs)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("timeDecayTouch: credit halves per half-life; zero-weight touches drop") {
    import spark.implicits._
    def run(rows: Seq[(Long, Timestamp, Long, String, Double)],
            halfLifeMs: Long) = {
      val df = rows.toDF("user_id", "ts", "event_id", "event_type", "value")
      Attribution.timeDecayTouch(df, "user_id", "ts", "event_id",
          "event_type", "value", touchTypes = Seq("view", "click"),
          convType = "purchase", lookbackMs = 40L * Day,
          halfLifeMs = halfLifeMs)
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    }
    // view at Δ=0 (w=10⁶), click one half-life earlier (w=5·10⁵):
    // 10.0 splits 2:1 with the linear gate's micro-floor (⅓ loses 1µ).
    val hl = 12L * 3600 * 1000
    val out = run(Seq(
      (1L, ts("2024-01-02 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 12:00:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-02 00:00:00"), 3L, "purchase", 10.0)), hl)
    assert(out == Map("view" -> ((1L, 6.666666)), "click" -> ((1L, 3.333333))))

    // A touch 20+ half-lives back weighs 0 and is DROPPED — the lone
    // remaining touch takes everything; a fully-stale journey is (none).
    val stale = run(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "click", 0.0), // 24 HLs back
      (1L, ts("2024-01-31 00:00:00"), 2L, "view", 0.0),
      (1L, ts("2024-01-31 00:00:00"), 3L, "purchase", 4.0),
      (2L, ts("2024-01-01 00:00:00"), 4L, "view", 0.0),
      (2L, ts("2024-01-31 00:00:00"), 5L, "purchase", 2.0)),
      halfLifeMs = 3600L * 1000)
    assert(stale == Map("view" -> ((1L, 4.0)), "(none)" -> ((1L, 2.0))))
  }

  test("linearTouch splits credit evenly across in-window touches") {
    val out = runLinear(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 01:00:00"), 2L, "click", 0.0),
      (1L, ts("2024-01-01 02:00:00"), 3L, "view", 0.0),
      (1L, ts("2024-01-01 03:00:00"), 4L, "purchase", 9.0)), Day)
    // 3 touches → 3 micro-units each: view 2×3.0, click 1×3.0
    assert(out == Map("view" -> ((1L, 6.0)), "click" -> ((1L, 3.0))))
  }

  test("linearTouch: out-of-window touches excluded; orphan conversions go to (none) at full value") {
    val out = runLinear(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-03 00:00:01"), 2L, "purchase", 5.0), // view 2d+1s old
      (2L, ts("2024-01-05 00:00:00"), 3L, "click", 0.0),
      (2L, ts("2024-01-05 00:30:00"), 4L, "purchase", 7.0)), 2 * Day)
    assert(out == Map("(none)" -> ((1L, 5.0)), "click" -> ((1L, 7.0))))
  }

  test("linearTouch micro-unit floor: 10.0 over 3 touches loses 1 micro-unit") {
    val out = runLinear(Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0),
      (1L, ts("2024-01-01 00:10:00"), 2L, "view", 0.0),
      (1L, ts("2024-01-01 00:20:00"), 3L, "click", 0.0),
      (1L, ts("2024-01-01 01:00:00"), 4L, "purchase", 10.0)), Day)
    // 10_000_000 div 3 = 3_333_333 → view 6.666666, click 3.333333
    assert(out == Map("view" -> ((1L, 6.666666)), "click" -> ((1L, 3.333333))))
  }

  test("conversion type may not be a touch type") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 00:00:00"), 1L, "view", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    intercept[IllegalArgumentException] {
      Attribution.lastTouch(df, "user_id", "ts", "event_id", "event_type",
        "value", touchTypes = Seq("view"), convType = "view", lookbackMs = Day)
    }
  }

  test("markovTransitions: journeys truncate at first conversion; empty-journey converters emit START→CONV") {
    import spark.implicits._
    // u1: A → conv (then a post-conversion B that must be ignored)
    // u2: A, B → conv;  u3: B → null;  u4: conv with no touches
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "P"),
      (1L, ts("2024-01-01 02:00:00"), 8L, "B"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "A"),
      (2L, ts("2024-01-01 01:00:00"), 4L, "B"),
      (2L, ts("2024-01-01 02:00:00"), 5L, "P"),
      (3L, ts("2024-01-01 00:00:00"), 6L, "B"),
      (4L, ts("2024-01-01 00:00:00"), 7L, "P"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.markovTransitions(df, "user_id", "ts", "event_id",
        "event_type", Seq("A", "B"), "P")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      ("(start)", "A") -> 2L, ("(start)", "B") -> 1L,
      ("(start)", "(conv)") -> 1L,
      ("A", "(conv)") -> 1L, ("A", "B") -> 1L,
      ("B", "(conv)") -> 1L, ("B", "(null)") -> 1L))
  }

  test("markovRemoval: hand-worked removal effects and normalized attribution") {
    import spark.implicits._
    // Same journeys as above. Exact absorption: v(B)=1/2, v(A)=3/4,
    // p = (2·3/4 + 1/2 + 1)/4 = 3/4. Remove A → 3/8; remove B → 1/2.
    // effects (3/8, 1/4) → removal (0.5, 1/3), attribution (0.6, 0.4).
    val df = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "A"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "P"),
      (2L, ts("2024-01-01 00:00:00"), 3L, "A"),
      (2L, ts("2024-01-01 01:00:00"), 4L, "B"),
      (2L, ts("2024-01-01 02:00:00"), 5L, "P"),
      (3L, ts("2024-01-01 00:00:00"), 6L, "B"),
      (4L, ts("2024-01-01 00:00:00"), 7L, "P"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = Attribution.markovRemoval(df, "user_id", "ts", "event_id",
        "event_type", Seq("A", "B"), "P", iters = 8)
      .as[(String, Double, Double, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out("A") == ((0.75, 0.375, Some(0.5), Some(0.6))))
    assert(out("B") == ((0.75, 0.5, Some(0.333333), Some(0.4))))
  }
}
