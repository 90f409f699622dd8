package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Eval

class EvalSpec extends AnyFunSuite with SparkTestBase {

  test("aucRankSum: perfect, random, inverted, and tied separations") {
    import spark.implicits._
    // Perfect: every positive above every negative.
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L), (0.1, 0L))
      .toDF("s", "y")
    assert(Eval.aucRankSum(perfect, "s", "y")
      .as[(Long, Long, Option[Double])].head() == ((2L, 2L, Some(1.0))))

    // Inverted: every positive below every negative → 0.
    val inverted = Seq((0.1, 1L), (0.2, 1L), (0.8, 0L), (0.9, 0L))
      .toDF("s", "y")
    assert(Eval.aucRankSum(inverted, "s", "y")
      .as[(Long, Long, Option[Double])].head()._3.contains(0.0))

    // All tied on one score → exactly chance (tie term carries it all).
    val tied = Seq((0.5, 1L), (0.5, 1L), (0.5, 0L), (0.5, 0L)).toDF("s", "y")
    assert(Eval.aucRankSum(tied, "s", "y")
      .as[(Long, Long, Option[Double])].head()._3.contains(0.5))

    // Hand-worked mix: scores (pos: .9, .4), (neg: .6, .2), ties none.
    // pairs: (.9 beats .6,.2)=2, (.4 beats .2)=1 → U=3 of 4 → 0.75.
    val mixed = Seq((0.9, 1L), (0.4, 1L), (0.6, 0L), (0.2, 0L)).toDF("s", "y")
    assert(Eval.aucRankSum(mixed, "s", "y")
      .as[(Long, Long, Option[Double])].head()._3.contains(0.75))

    // Single-class input → NULL auc, counts still reported.
    val oneClass = Seq((0.9, 1L), (0.4, 1L)).toDF("s", "y")
    assert(Eval.aucRankSum(oneClass, "s", "y")
      .as[(Long, Long, Option[Double])].head() == ((2L, 0L, None)))
  }

  test("ndcgAtK: hand-worked hits, perfect ordering, empty truth, out-of-k relevance") {
    import spark.implicits._
    val scored = Seq((1L, 4.0), (2L, 3.0), (3L, 2.0), (4L, 1.0)).toDF("id", "s")
    def truthOf(ids: Long*) = ids.toDF("tid")
    def run(truth: Seq[Long], k: Int) =
      Eval.ndcgAtK(scored, "id", "s", truthOf(truth: _*), "tid", k)
        .as[(Int, Long, Option[Double])].head()
    // hits at ranks 1 and 3: dcg = 1000000+500000; idcg(R=2) = 1630930
    assert(run(Seq(1L, 3L), 3) == ((3, 2L, Some(0.919721))))
    // top-3 exactly the relevant set → 1.0
    assert(run(Seq(1L, 2L, 3L), 3) == ((3, 3L, Some(1.0))))
    // empty truth → NULL
    assert(run(Seq(), 3) == ((3, 0L, None)))
    // relevant docs outside the top-k (or unscored) → 0.0
    assert(run(Seq(4L, 9L), 3) == ((3, 2L, Some(0.0))))
  }

  test("averagePrecision: threshold steps, perfect ranking, tie collapse, one-class guard") {
    import spark.implicits._
    // Steps at 0.9 (R 0→.5, P 1) and 0.7 (R .5→1, P 2/3): AP = 0.833333.
    val mixed = Seq((0.9, 1L), (0.8, 0L), (0.7, 1L), (0.6, 0L)).toDF("s", "y")
    assert(Eval.averagePrecision(mixed, "s", "y")
      .as[(Long, Long, Option[Double])].head() == ((2L, 2L, Some(0.833333))))
    // Perfect ranking → 1.0.
    val perfect = Seq((0.9, 1L), (0.8, 1L), (0.2, 0L)).toDF("s", "y")
    assert(Eval.averagePrecision(perfect, "s", "y")
      .as[(Long, Long, Option[Double])].head()._3.contains(1.0))
    // All tied: ONE threshold step → AP = prevalence (2/4).
    val tied = Seq((0.5, 1L), (0.5, 1L), (0.5, 0L), (0.5, 0L)).toDF("s", "y")
    assert(Eval.averagePrecision(tied, "s", "y")
      .as[(Long, Long, Option[Double])].head()._3.contains(0.5))
    // Single-class input → NULL.
    val oneClass = Seq((0.9, 1L), (0.4, 1L)).toDF("s", "y")
    assert(Eval.averagePrecision(oneClass, "s", "y")
      .as[(Long, Long, Option[Double])].head()._3.isEmpty)
  }

  test("bestF1: threshold sweep picks the max-F1 cut; degenerate guards") {
    import spark.implicits._
    // F1 by threshold: 0.9→⅔, 0.8→0.5, 0.7→0.8 (best), 0.6→⅔.
    val mixed = Seq((0.9, 1L), (0.8, 0L), (0.7, 1L), (0.6, 0L)).toDF("s", "y")
    val r = Eval.bestF1(mixed, "s", "y")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
           Option[Double])].head()
    assert(r == ((2L, 2L, Some(0.7), Some(0.666667), Some(1.0), Some(0.8))))
    // All positives: the lowest threshold reaches F1 = 1.
    val allPos = Seq((0.9, 1L), (0.5, 1L)).toDF("s", "y")
    val rp = Eval.bestF1(allPos, "s", "y")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
           Option[Double])].head()
    assert(rp == ((2L, 0L, Some(0.5), Some(1.0), Some(1.0), Some(1.0))))
    // No positives → NULL operating point.
    val none = Seq((0.9, 0L)).toDF("s", "y")
    assert(Eval.bestF1(none, "s", "y")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
           Option[Double])].head()._6.isEmpty)
  }

  test("effectiveSampleSize: uniform weights keep the corpus, a spike collapses it") {
    import spark.implicits._
    import graft.operators.Dsir
    val uniform = Seq(0.0, 0.0, 0.0, 0.0).toDF("logw")
    assert(Dsir.effectiveSampleSize(uniform, "logw")
      .as[(Long, Option[Double], Option[Double])].head()
      == ((4L, Some(4.0), Some(1.0))))
    // One dominant weight (e^0 vs e^-20 ≈ 0 after µ-quantization):
    // ESS collapses to ~1 of 2.
    val spike = Seq(0.0, -20.0).toDF("logw")
    val rs = Dsir.effectiveSampleSize(spike, "logw")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(rs == ((2L, Some(1.0), Some(0.5))))
  }

  test("brierDecomposition: hand bins satisfy brier = rel − res + unc") {
    import spark.implicits._
    // Two bins of two rows: (0.8,1)(0.8,1) and (0.2,0)(0.2,1).
    // brier = (3·0.04 + 0.64)/4 = 0.19; rel = 0.02+0.045 = 0.065;
    // res = 0.03125·2 = 0.0625; unc = 0.75·0.25 = 0.1875 — identity holds.
    val df = Seq((0.8, 1L), (0.8, 1L), (0.2, 0L), (0.2, 1L)).toDF("s", "y")
    val r = Eval.brierDecomposition(df, "s", "y", nBins = 2)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r == ((4L, 0.19, 0.065, 0.0625, 0.1875)))
    assert(math.abs(r._2 - (r._3 - r._4 + r._5)) < 1e-9)
  }

  test("associationRules: direction matters — confidence differs, lift doesn't") {
    import spark.implicits._
    import graft.operators.MarketBasket
    // b1{x,y} b2{x,y} b3{x} b4{x} b5{y,z}: pair (x,y)=2; x in 4, y in 3.
    // x→y conf 0.5; y→x conf 2/3; lift both 2·5/12.
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"),
      (4L, "x"), (5L, "y"), (5L, "z")).toDF("b", "i")
    val out = MarketBasket.associationRules(df, "b", "i",
      minPairs = 2, minConfPct = 50, topK = 10)
      .as[(String, String, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(out.keySet == Set(("x", "y"), ("y", "x")))
    assert(out(("x", "y"))._5 == 0.5 && out(("y", "x"))._5 == 0.666667)
    assert(out(("x", "y"))._6 == 0.833333 && out(("y", "x"))._6 == 0.833333)
    assert(out(("x", "y"))._4 == 0.4) // support 2/5
    // 67% floor cuts the weaker direction (integer gate: 2·100 ≥ 67·3).
    val strict = MarketBasket.associationRules(df, "b", "i",
      minPairs = 2, minConfPct = 60, topK = 10)
      .as[(String, String, Long, Double, Double, Double)].collect()
    assert(strict.map(r => (r._1, r._2)).toSet == Set(("y", "x")))
  }

  test("agreementStats: hand kappa + mcnemar, perfect and degenerate raters") {
    import spark.implicits._
    // 40/40 concordant, 15 vs 5 discordant: po=0.8, pe=0.495,
    // κ = 0.305/0.505; McNemar = 10²/20 = 5.
    val rows = Seq.fill(40)((1L, 1L)) ++ Seq.fill(40)((0L, 0L)) ++
      Seq.fill(15)((1L, 0L)) ++ Seq.fill(5)((0L, 1L))
    val r = Eval.agreementStats(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .head()
    assert(r == ((100L, 40L, 40L, 15L, 5L, Some(0.60396), Some(5.0))))

    // Perfect mixed-margin agreement → κ = 1, no discordants → NULL χ².
    val perfect = (Seq.fill(3)((1L, 1L)) ++ Seq.fill(2)((0L, 0L))).toDF("a", "b")
    val rp = Eval.agreementStats(perfect, "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])].head()
    assert(rp._6.contains(1.0) && rp._7.isEmpty)

    // Both raters constant-positive: pe = 1 → κ undefined (NULL).
    val const = Seq.fill(4)((1L, 1L)).toDF("a", "b")
    assert(Eval.agreementStats(const, "a", "b")
      .as[(Long, Long, Long, Long, Long, Option[Double], Option[Double])]
      .head()._6.isEmpty)
  }

  test("targetEncodeLoo: self-excluded means, singleton category is NULL") {
    import spark.implicits._
    import graft.operators.Features
    val df = Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "b", 7.0)).toDF("id", "cat", "y")
    val out = Features.targetEncodeLoo(df, "id", "cat", "y")
      .as[(Long, String, Option[Double])].collect().map(r => r._1 -> r._3).toMap
    // cat a sums to 6: each row sees the other two's mean.
    assert(out == Map(1L -> Some(2.5), 2L -> Some(2.0), 3L -> Some(1.5),
      4L -> None))
  }

  test("conformalCoverage: zero-residual calibration, rank clamp, held-out coverage") {
    import spark.implicits._
    import graft.operators.{Eval, Splits}
    import org.apache.spark.sql.functions.col
    // Discover hash-split membership, then hand-build: 5 calibration
    // rows all exactly at the predictor (residual 0 → q̂ = 0; the rank
    // ⌈6·0.9⌉ = 6 clamps to n_cal = 5), 4 eval rows of which 3 sit on
    // the prediction → coverage 0.75.
    val ids = (1L to 60L)
    val bucket = Seq(ids: _*).toDF("id")
      .select(col("id"), Splits.bucketOf(col("id"), 100).as("b"))
      .as[(Long, Long)].collect().toMap
    val cal = ids.filter(bucket(_) < 50).take(5)
    val eval_ = ids.filter(bucket(_) >= 50).take(4)
    assert(cal.size == 5 && eval_.size == 4)
    val rows = cal.map((_, "g", 10.0)) ++
      eval_.take(3).map((_, "g", 10.0)) ++ eval_.drop(3).map((_, "g", 12.0))
    val r = Eval.conformalCoverage(rows.toDF("id", "g", "y"), "id", "g", "y",
      calPct = 50, alphaPct = 10)
      .as[(Long, Long, Long, Double, Option[Double])].head()
    assert(r == ((5L, 4L, 5L, 0.0, Some(0.75))))
  }

  test("calibrationBins: integer-space bin edges, mean score and positive rate per bin") {
    import spark.implicits._
    // 0.35→bin 3; 0.30 sits ON the 3-edge → bin 3 (micro space: 300000*10//1e6=3);
    // 0.999999→bin 9; 1.0 caps into bin 9.
    val df = Seq((0.35, 1L), (0.3, 0L), (0.999999, 1L), (1.0, 1L))
      .toDF("s", "y")
    val out = Eval.calibrationBins(df, "s", "y", nBins = 10)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(3L) == ((2L, 0.325, 0.5)))
    assert(out(9L) == ((2L, 1.0, 1.0)))   // (0.999999+1.0)/2 rounds to 1.0
    assert(out.size == 2)
  }

  test("confidentJoint: hand-worked thresholds, off-diagonal noise, unassigned band") {
    import spark.implicits._
    // y=1 scores {.9,.7,.2} → t₁=0.6; y=0 scores {.1,.3,.8} → t₀=0.4.
    // conf-pos (≥.6): .9y1 .7y1 .8y0; conf-neg (≤.4): .2y1 .1y0 .3y0.
    val df = Seq((0.9, 1L), (0.7, 1L), (0.2, 1L),
      (0.1, 0L), (0.3, 0L), (0.8, 0L)).toDF("s", "y")
    val r = Eval.confidentJoint(df, "s", "y")
      .as[(Long, Double, Double, Long, Long, Long, Long, Long,
           Option[Double])].head()
    assert(r == ((6L, 0.6, 0.4, 2L, 1L, 1L, 2L, 0L, Some(0.333333))))

    // Well-separated labels: zero suspected noise, the between-threshold
    // band stays unassigned rather than guessed.
    val clean = Seq((0.9, 1L), (0.8, 1L), (0.1, 0L), (0.2, 0L)).toDF("s", "y")
    val rc = Eval.confidentJoint(clean, "s", "y")
      .as[(Long, Double, Double, Long, Long, Long, Long, Long,
           Option[Double])].head()
    assert(rc._4 == 1L && rc._7 == 1L && rc._8 == 2L && rc._9.contains(0.0))
  }

  test("isotonicCalibration: PAV pooling of a violating middle bucket; monotone output") {
    import spark.implicits._
    // buckets (by score): 20→rate 0.8, 60→rate 0.2, 80→rate 0.6.
    // PAV pools (0.8, 0.2) → 0.5; 0.5 ≤ 0.6 keeps the last → [0.5, 0.5, 0.6].
    def rows(s: Double, pos: Int, neg: Int) =
      Seq.fill(pos)((s, 1L)) ++ Seq.fill(neg)((s, 0L))
    val df = (rows(0.2, 4, 1) ++ rows(0.6, 1, 4) ++ rows(0.8, 3, 2))
      .toDF("s", "y")
    val out = Eval.isotonicCalibration(df, "s", "y")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (20L, 5L, 0.8, 0.5), (60L, 5L, 0.2, 0.5), (80L, 5L, 0.6, 0.6)))

    // Already-monotone rates pass through unchanged.
    val mono = (rows(0.2, 1, 4) ++ rows(0.6, 3, 2) ++ rows(0.8, 4, 1))
      .toDF("s", "y")
    val om = Eval.isotonicCalibration(mono, "s", "y")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).toSeq
    assert(om.forall(r => r._3 == r._4))

    // The fit is monotone for ANY input (the guarantee thresholds need).
    val noisy = (1 to 200).map(i =>
      ((i % 17).toDouble / 17.0, (i % 3 == 0).compareTo(false).toLong))
      .toDF("s", "y")
    val on = Eval.isotonicCalibration(noisy, "s", "y")
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1).map(_._4)
    assert(on.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
  }

  test("quantileNormalize: hot source mapped onto the pooled distribution") {
    import spark.implicits._
    import graft.operators.Features
    // Source "hot" scores 10× source "cold" but both are the same shape;
    // after normalization equal within-source ranks share the same value.
    val hot = (1L to 10L).map(i => (i, "hot", i * 10.0))
    val cold = (11L to 20L).map(i => (i, "cold", (i - 10) * 1.0))
    val df = (hot ++ cold).toDF("id", "src", "s")
    val out = Features.quantileNormalize(df, "id", "src", "s", grid = 100)
      .as[(Long, String, Double, Long, Double)].collect()
    assert(out.length == 20)
    val byId = out.map(r => r._1 -> r).toMap
    // same within-source rank → same bucket → same pooled value
    for (k <- 1L to 10L)
      assert(byId(k)._4 == byId(k + 10L)._4 && byId(k)._5 == byId(k + 10L)._5)
    // normalization preserves within-source order
    val hotSorted = out.filter(_._2 == "hot").sortBy(_._3).map(_._5)
    assert(hotSorted.sliding(2).forall(p => p(0) <= p(1)))
    // normalized values come from the POOLED value set
    val pooled = df.as[(Long, String, Double)].collect().map(_._3).toSet
    assert(out.forall(r => pooled.contains(r._5)))
    // the pooled max maps to itself (top bucket → rank-N order statistic)
    assert(out.map(_._5).max == 100.0)

    // unbalanced groups: a 3-row source against a 10-row source still
    // lands every row in [1, grid] with a defined pooled value
    val tiny = Seq((100L, "tiny", 0.5), (101L, "tiny", 55.0),
      (102L, "tiny", 200.0))
    val out2 = Features.quantileNormalize((hot ++ tiny).toDF("id", "src", "s"),
      "id", "src", "s", grid = 100)
      .as[(Long, String, Double, Long, Double)].collect()
    assert(out2.length == 13)
    assert(out2.forall(r => r._4 >= 1L && r._4 <= 100L))
    // tiny's max (200, its rank-3/3 = bucket 100) → pooled max 200
    assert(out2.find(_._1 == 102L).get._5 == 200.0)
  }

  test("regressionMetrics: hand-worked ANOVA fit; perfect and useless features") {
    import spark.implicits._
    // groups: a→{1,3} (mean 2), b→{5} (mean 5); grand mean 3.
    // SSE = 1+1+0 = 2; SST = 4+0+4 = 8 → R² = 0.75;
    // RMSE = √(2/3) = 0.816497; MAE = (1+1+0)/3 = 0.666667.
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("g", "v")
    val r = Eval.regressionMetrics(df, "g", "v")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r == ((3L, 2L, 3.0, 0.816497, 0.666667, 0.75)))

    // Perfect feature: one value per group → SSE 0, R² 1.
    val perfect = Seq(("a", 2.0), ("b", 7.0)).toDF("g", "v")
    val rp = Eval.regressionMetrics(perfect, "g", "v")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(rp._4 == 0.0 && rp._5 == 0.0 && rp._6 == 1.0)

    // Useless feature: identical group distributions → R² 0 here
    // (group means equal the grand mean).
    val none = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    assert(Eval.regressionMetrics(none, "g", "v")
      .as[(Long, Long, Double, Double, Double, Double)].head()._6 == 0.0)

    // Degenerate target (SST = 0: every value identical): "fraction of
    // variance explained" is undefined — R² must be NULL, never the
    // 0/0 NaN, matching the fano/gini/alignment denominator gates.
    val flat = Seq(("a", 4.0), ("a", 4.0), ("b", 4.0)).toDF("g", "v")
    val rf = Eval.regressionMetrics(flat, "g", "v")
      .select("n", "rmse", "r2").collect().head
    assert(rf.getLong(0) == 3L && rf.getDouble(1) == 0.0 && rf.isNullAt(2))
  }
}
