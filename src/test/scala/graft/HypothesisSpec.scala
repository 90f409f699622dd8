package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Hypothesis

class HypothesisSpec extends AnyFunSuite with SparkTestBase {

  test("welchTTest: hand-worked unequal-variance case, guards") {
    import spark.implicits._
    // a = [1,2,3] (mean 2, var 1); b = [2,4,6,8] (mean 5, var 20/3).
    // se² = 1/3 + (20/3)/4 = 2 → t = −3/√2 = −2.121320
    // df = 2² / ((1/3)²/2 + (5/3)²/3) = 4 / (1/18 + 25/27) = 4.075472
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (2.0, "b"), (4.0, "b"), (6.0, "b"), (8.0, "b"), (9.9, "zz"))
      .toDF("v", "g")
    val r = Hypothesis.welchTTest(df, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])].head()
    assert(r._1 == 3L && r._2 == 4L)
    assert(r._3 == 2.0 && r._4 == 5.0)
    assert(r._5.contains(-2.12132))
    assert(r._6.contains(4.075472))

    // One side below 2 rows → NULL t/df, counts and means still out.
    val tiny = Seq((1.0, "a"), (2.0, "b"), (3.0, "b")).toDF("v", "g")
    val rt = Hypothesis.welchTTest(tiny, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])].head()
    assert(rt._1 == 1L && rt._5.isEmpty && rt._6.isEmpty)

    // Zero variance both sides → NULL t (se² = 0 guard).
    val flat = Seq((2.0, "a"), (2.0, "a"), (5.0, "b"), (5.0, "b")).toDF("v", "g")
    assert(Hypothesis.welchTTest(flat, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double])]
      .head()._5.isEmpty)
  }

  test("chiSquared: balanced 2×2, absent cell contributes its expectation") {
    import spark.implicits._
    // 2×2 with all cells present: e = 15 everywhere, χ² = 4·(25/15) =
    // 6.6̄ — each cell's 1.6̄ contribution micro-quantizes UP (1666667),
    // so the order-independent total reads 6.666668 (±0.5e-6/cell by
    // design; the oracle quantizes identically).
    val full = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y"))
      ++ Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("r", "c")
    val rf = Hypothesis.chiSquared(full, "r", "c")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(rf == ((60L, 2L, 2L, 1L, Some(6.666668), Some(0.333333))))

    // (b, y) absent: its cell still contributes e = 2.5; the two 0.83̄
    // cells quantize DOWN → 6.666666. V = √(χ²/N) = 0.577350.
    val sparse = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y"))
      ++ Seq.fill(10)(("b", "x"))).toDF("r", "c")
    val rs = Hypothesis.chiSquared(sparse, "r", "c")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(rs == ((20L, 2L, 2L, 1L, Some(6.666666), Some(0.57735))))

    // Degenerate (one column value) → NULL χ²/V, dims reported.
    val degen = Seq(("a", "x"), ("b", "x")).toDF("r", "c")
    val rd = Hypothesis.chiSquared(degen, "r", "c")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(rd._3 == 1L && rd._5.isEmpty && rd._6.isEmpty)
  }

  test("cuped: perfectly correlated covariate removes all variance; zero-variance guard") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    def ev(rows: Seq[(Long, Long, Double)]) = rows
      .toDF("user_id", "sec", "value")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"), col("value"))
    // y = 2x exactly: θ = 2, var_y = 4, var_adj = 0, reduction = 1.
    // pre events at t=5s (< 10s split), post at t=15s.
    val perfect = ev(Seq(
      (1L, 5L, 1.0), (1L, 15L, 2.0),
      (2L, 5L, 2.0), (2L, 15L, 4.0),
      (3L, 5L, 3.0), (3L, 15L, 6.0)))
    val r = Hypothesis.cuped(perfect, "user_id", "ts", "value", splitMs = 10000L)
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .head()
    assert(r == ((3L, Some(2.0), Some(4.0), Some(0.0), Some(1.0))))

    // Constant covariate → var(x) = 0: θ/adjustment NULL, var_y kept.
    val flat = ev(Seq(
      (1L, 5L, 1.0), (1L, 15L, 1.0),
      (2L, 5L, 1.0), (2L, 15L, 3.0)))
    val rf = Hypothesis.cuped(flat, "user_id", "ts", "value", splitMs = 10000L)
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .head()
    assert(rf == ((2L, None, Some(2.0), None, None)))
  }

  test("diffInDiff: cells partition rows, did matches the four recomputed means") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    import graft.operators.Splits
    // Assignment is the deterministic hash split — discover each id's
    // arm, then hand-build a frame with a known per-cell structure.
    val ids = (1L to 40L)
    val arm = Seq(ids: _*).toDF("id")
      .select(col("id"), Splits.bucketOf(col("id"), 2).as("b"))
      .as[(Long, Long)].collect().toMap
    val treated = ids.filter(arm(_) == 0L).take(3)
    val control = ids.filter(arm(_) == 1L).take(3)
    assert(treated.size == 3 && control.size == 3)
    // treat: pre 1.0, post 3.0 (lift 2); control: pre 1.0, post 1.5
    // (trend 0.5) → DiD = 1.5.
    val rows = treated.flatMap(u => Seq((u, 5L, 1.0), (u, 15L, 3.0))) ++
      control.flatMap(u => Seq((u, 5L, 1.0), (u, 15L, 1.5)))
    val df = rows.toDF("user_id", "sec", "value")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"), col("value"))
    val r = Hypothesis.diffInDiff(df, "user_id", "ts", "value", splitMs = 10000L)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
           Option[Double], Option[Double], Option[Double])].head()
    assert(r == ((3L, 3L, 3L, 3L, Some(1.0), Some(3.0), Some(1.0),
      Some(1.5), Some(1.5))))

    // An empty cell (no control-post rows) → NULL did, cells reported.
    val partial = (treated.map(u => (u, 5L, 1.0))
      ++ treated.map(u => (u, 15L, 3.0)) ++ control.map(u => (u, 5L, 1.0)))
      .toDF("user_id", "sec", "value")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"), col("value"))
    val rp = Hypothesis.diffInDiff(partial, "user_id", "ts", "value",
      splitMs = 10000L)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
           Option[Double], Option[Double], Option[Double])].head()
    assert(rp._4 == 0L && rp._9.isEmpty)
  }

  test("stratifiedAtt: stratum-weighted diff, off-support treated reported not absorbed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    import graft.operators.Splits
    val ids = (1L to 60L)
    val arm = Seq(ids: _*).toDF("id")
      .select(col("id"), Splits.bucketOf(col("id"), 2).as("b"))
      .as[(Long, Long)].collect().toMap
    val Seq(t1, t2, t3) = ids.filter(arm(_) == 0L).take(3).toSeq
    val Seq(c1, c2) = ids.filter(arm(_) == 1L).take(2).toSeq
    // strata by pre-count: k=1 (npre=1): t1 post 10 vs c1 post 6;
    // k=2 (npre=3): t2 post 20 vs c2 post 8; k=3 (npre=7): t3 ONLY —
    // off support. ATT = ½·4 + ½·12 = 8.
    def unit(u: Long, npre: Int, post: Double) =
      (1 to npre).map(i => (u, 5L + i, 1.0)) :+ ((u, 20000L, post))
    val rows = unit(t1, 1, 10.0) ++ unit(c1, 1, 6.0) ++
      unit(t2, 3, 20.0) ++ unit(c2, 3, 8.0) ++ unit(t3, 7, 99.0)
    val df = rows.toDF("user_id", "sec", "value")
      .select(col("user_id"), to_timestamp(col("sec")).as("ts"), col("value"))
    val r = Hypothesis.stratifiedAtt(df, "user_id", "ts", "value",
      splitMs = 10000000L)
      .as[(Long, Long, Long, Long, Long, Option[Double])].head()
    assert(r == ((3L, 2L, 3L, 2L, 1L, Some(8.0))))
  }

  test("srmCheck: balanced split passes, one-armed assignment fires") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.operators.Splits
    val ids = (1L to 200L)
    val arm = Seq(ids: _*).toDF("id")
      .select(col("id"), Splits.bucketOf(col("id"), 2).as("b"))
      .as[(Long, Long)].collect().toMap
    // Exactly balanced by construction: 10 units per arm → χ² = 0.
    val bal = (ids.filter(arm(_) == 0L).take(10)
      ++ ids.filter(arm(_) == 1L).take(10)).toDF("user_id")
    val rb = Hypothesis.srmCheck(bal, "user_id", nBuckets = 2, crit = 10.828)
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(rb == ((20L, 2L, 1L, 0.0, false)))

    // Every unit in one arm: χ² = n = 20 > 10.828 → SRM fires. Repeated
    // events per unit must not inflate the count (distinct units).
    val one = ids.filter(arm(_) == 0L).take(20)
    val oneArm = (one ++ one).toDF("user_id") // duplicate rows
    val ro = Hypothesis.srmCheck(oneArm, "user_id", nBuckets = 2, crit = 10.828)
      .as[(Long, Long, Long, Double, Boolean)].head()
    assert(ro == ((20L, 2L, 1L, 20.0, true)))
  }

  test("ksTest: hand-worked ECDF gap, disjoint supports, empty side") {
    import spark.implicits._
    // a = [1,2,3], b = [2,3,4]: max gap 1/3 at v ∈ {1,2,3};
    // ks = (1/3)·√(9/6) = 0.408248.
    val df = Seq((1.0, "a"), (2.0, "a"), (3.0, "a"),
      (2.0, "b"), (3.0, "b"), (4.0, "b")).toDF("v", "g")
    val r = Hypothesis.ksTest(df, "v", "g", "a", "b")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(r == ((3L, 3L, Some(0.333333), Some(0.408248))))

    // Disjoint supports → D = 1.
    val disj = Seq((1.0, "a"), (2.0, "b")).toDF("v", "g")
    assert(Hypothesis.ksTest(disj, "v", "g", "a", "b")
      .as[(Long, Long, Option[Double], Option[Double])].head()._3.contains(1.0))

    // Identical samples → D = 0.
    val same = Seq((1.0, "a"), (2.0, "a"), (1.0, "b"), (2.0, "b")).toDF("v", "g")
    assert(Hypothesis.ksTest(same, "v", "g", "a", "b")
      .as[(Long, Long, Option[Double], Option[Double])].head()._3.contains(0.0))

    // Empty b side → NULL statistics.
    val one = Seq((1.0, "a")).toDF("v", "g")
    val ro = Hypothesis.ksTest(one, "v", "g", "a", "b")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(ro._3.isEmpty && ro._4.isEmpty)
  }

  test("simpsonAudit: the classic reversal — every stratum favors A, the pool favors B") {
    import spark.implicits._
    // Kidney-stone layout. Small: A 81/87 vs B 234/270; Large: A 192/263
    // vs B 55/80 — A wins both strata, B wins pooled (273/350 vs 289/350).
    def arm(s: String, e: Boolean, pos: Int, neg: Int) =
      Seq.fill(pos)((s, e, true)) ++ Seq.fill(neg)((s, e, false))
    val df = (arm("small", true, 81, 6) ++ arm("small", false, 234, 36) ++
      arm("large", true, 192, 71) ++ arm("large", false, 55, 25))
      .toDF("stratum", "exposed", "cured")
    val r = Hypothesis.simpsonAudit(df, "stratum", "exposed", "cured")
      .as[(Long, Long, Long, Option[Double], Option[Double],
           Option[Double], Option[Double], Long)].head()
    assert(r._1 == 700L && r._2 == 2L && r._3 == 0L)
    assert(r._4.contains(-0.045714))            // pooled favors B
    assert(r._5.contains(0.053671))             // strata favor A
    assert(r._6.contains(0.042538) && r._7.contains(0.064368))
    assert(r._8 == 2L)                          // both strata flip

    // A one-armed stratum is undefined, excluded from the weighted
    // mean and flips, and counted.
    val partial = (arm("s1", true, 3, 1) ++ arm("s1", false, 1, 3) ++
      arm("s2", true, 5, 0)).toDF("stratum", "exposed", "cured")
    val rp = Hypothesis.simpsonAudit(partial, "stratum", "exposed", "cured")
      .as[(Long, Long, Long, Option[Double], Option[Double],
           Option[Double], Option[Double], Long)].head()
    assert(rp._2 == 2L && rp._3 == 1L && rp._5.contains(0.5) && rp._8 == 0L)
  }

  test("poissonBootstrap: deterministic, ordered CI brackets the mean, width shrinks with n") {
    import spark.implicits._
    // a spread-out but well-behaved sample: v = 10 + (i mod 37)
    def sample(n: Int) =
      (1 to n).map(i => (i.toLong, 10.0 + (i % 37))).toDF("id", "v")

    val r = Hypothesis.poissonBootstrap(sample(200), "id", "v").as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 == 200L && r._2 == 40L)
    // CI is ordered and brackets the point estimate.
    assert(r._5 <= r._3 && r._3 <= r._6 && r._5 < r._6)
    assert(r._4 > 0.0)
    // Pure function of (data, salt): re-running gives identical bits.
    assert(Hypothesis.poissonBootstrap(sample(200), "id", "v").as[(Long, Long, Double, Double, Double, Double)].head() == r)
    // A different salt moves the draw but not the point estimate.
    val r2 = Hypothesis.poissonBootstrap(sample(200), "id", "v",
      salt = "boot2").as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r2._3 == r._3 && (r2._5 != r._5 || r2._6 != r._6))

    // 16× more data → the CI tightens (≈4× in theory; assert 2× margin).
    val big = Hypothesis.poissonBootstrap(sample(3200), "id", "v").as[(Long, Long, Double, Double, Double, Double)].head()
    assert((big._6 - big._5) * 2.0 < (r._6 - r._5))

    // Degenerate data: constant column → zero-width CI at the constant.
    val const = (1 to 50).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val rc = Hypothesis.poissonBootstrap(const, "id", "v").as[(Long, Long, Double, Double, Double, Double)].head()
    assert(rc._3 == 5.0 && rc._5 == 5.0 && rc._6 == 5.0 && rc._4 == 0.0)
  }
}
