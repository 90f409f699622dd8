package graft

import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

import graft.operators.Survival

class SurvivalSpec extends AnyFunSuite with SparkTestBase {

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 01:00:00")

  test("kaplanMeier: censored users leave the risk set without counting as churn") {
    import spark.implicits._
    // Corpus last day = 20. horizon 7:
    //   u1 day 1 only        → t=0,  churned (19 idle)
    //   u2, u3 days 1..3     → t=2,  churned (17 idle)
    //   u5 days 10..16       → t=6,  CENSORED (4 idle)
    //   u4 days 5..20        → t=15, CENSORED (0 idle)
    // S(0) = 4/5 = 0.8; S(2) = 0.8·(1 − 2/4) = 0.4; then flat — the
    // two censored users never push the curve down.
    val rows =
      Seq((1L, ts(1))) ++
      Seq(2L, 3L).flatMap(u => (1 to 3).map(d => (u, ts(d)))) ++
      (10 to 16).map(d => (5L, ts(d))) ++
      (5 to 20).map(d => (4L, ts(d)))
    val out = Survival.kaplanMeier(rows.toDF("user_id", "ts"), "user_id",
        "ts", horizonDays = 7)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 5L, 1L, 0.8),
      (2L, 4L, 2L, 0.4),
      (6L, 2L, 0L, 0.4),
      (15L, 1L, 0L, 0.4)))
  }

  test("kaplanMeier: horizon 0 marks everyone churned — the curve hits exactly 0") {
    import spark.implicits._
    val rows = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(3)))
    val out = Survival.kaplanMeier(rows.toDF("user_id", "ts"), "user_id",
        "ts", horizonDays = 0)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0L, 2L, 1L, 0.5), (2L, 1L, 1L, 0.0)))
  }
}
