package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profile

/** Null-handling and failure branches of the profiler/expectation gate —
  * the oracle fixture (documents) is null-free and unique-keyed, so the
  * paths that make the operator useful (nulls counted, checks FAILING)
  * are pinned here.
  */
class ProfileSpec extends AnyFunSuite with SparkTestBase {

  private def fixture = {
    import spark.implicits._
    // 6 rows: id 3 duplicated, two null texts, one null score.
    Seq(
      (1L, Option("aaaa"), Option(10.0)),
      (2L, None, Option(20.0)),
      (3L, Option("bb"), None),
      (3L, Option("cccccc"), Option(40.0)),
      (4L, None, Option(50.0)),
      (5L, Option("dd"), Option(60.0))
    ).toDF("id", "text", "score")
  }

  test("profile counts nulls and distincts per column, length stats for strings") {
    val out = Profile.profile(fixture, numCols = Seq("id", "score"), strCols = Seq("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("id", "score", "text"))
    val id = out("id")
    assert(id.getLong(1) == 0L && id.getLong(2) == 5L)      // n_nulls, n_distinct
    assert(id.getDouble(3) == 1.0 && id.getDouble(4) == 5.0)
    val score = out("score")
    assert(score.getLong(1) == 1L && score.getLong(2) == 5L)
    assert(score.getDouble(5) == 36.0)                       // mean over non-nulls
    val text = out("text")
    assert(text.getLong(1) == 2L && text.getLong(2) == 4L)
    assert(text.getDouble(3) == 2.0 && text.getDouble(4) == 6.0)  // length stats
    assert(text.getLong(6) == 6L)                            // n_rows counts all
  }

  test("expectations fail loudly on duplicate keys and null fractions over bound") {
    val out = Profile.expectations(fixture, keyCol = "id",
      nullBoundedCols = Seq("text", "score"), minRows = 10L, maxNullFraction = 0.2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("row_count_min").getInt(3) == 0)              // 6 < 10
    assert(out("pk_unique:id").getInt(3) == 0)               // id 3 duplicated
    assert(out("pk_unique:id").getDouble(1) == 5.0)          // distinct count surfaced
    assert(out("null_fraction_max:text").getInt(3) == 0)     // 2/6 ≈ 0.33 > 0.2
    assert(out("null_fraction_max:score").getInt(3) == 1)    // 1/6 ≈ 0.17 ≤ 0.2
    assert(out("null_fraction_max:score").getDouble(1) == 0.166667)
  }

  test("histogram: even spread, max clamped into the last bucket, nulls out, degenerate collapses") {
    import spark.implicits._
    val vals = (0 to 9).map(v => Some(v.toLong)) :+ Option.empty[Long]
    val out = Profile.histogram(vals.toDF("x"), "x", 5)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3))))
      .toMap
    // width (9-0)/5 = 1.8: buckets get {0,1}, {2,3}, {4,5}, {6,7}, {8,9};
    // the max value 9 computes bucket 5 and clamps to 4; the null is gone
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(out.values.map(_._3).sum == 10L)
    assert(out(0L)._1 == 0.0 && out(4L)._2 == 9.0)
    assert(out(4L)._3 == 2L)
    val flat = Profile.histogram(Seq(5L, 5L, 5L).toDF("x"), "x", 5).collect()
    assert(flat.length == 1 && flat.head.getLong(0) == 0L
      && flat.head.getLong(3) == 3L)
  }

  test("fkCheck: orphans counted, null FKs excluded but reported, clean parentage passes") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(2L), Some(9L), None).toDF("fk")
    val r = Profile.fkCheck(child, "fk", parent, "pk").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)) ==
      ((4L, 3L, 1L, 0)))
    val clean = Profile.fkCheck(Seq(1L, 1L, 3L).toDF("fk"), "fk", parent, "pk")
      .collect().head
    assert(clean.getLong(2) == 0L && clean.getInt(3) == 1)
  }

  test("fdCheck: held and violated dependencies, null B-values break a dependency") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("x")), (1L, Some("x")),   // group 1: determined
      (2L, Some("y")), (2L, Some("z")),   // group 2: two values → violates
      (3L, Some("w")), (3L, None))        // group 3: value AND null → violates
      .toDF("a", "b")
    val r = Profile.fdCheck(df, "a", "b").collect().head
    assert((r.getLong(0), r.getLong(1), r.getInt(2)) == ((3L, 2L, 0)))
    val held = Profile.fdCheck(
        df.filter(org.apache.spark.sql.functions.col("a") === 1L), "a", "b")
      .collect().head
    assert(held.getLong(1) == 0L && held.getInt(2) == 1)
  }

  test("keySkew: uniform keys score gini 0, hand-checked skew, null keys are a real group") {
    import spark.implicits._
    val uniform = Seq(1L, 2L, 3L, 4L).map(k => (Some(k), "r")).toDF("k", "v")
    val u = Profile.keySkew(uniform, "k").collect().head
    assert(u.getLong(0) == 4L && u.getLong(1) == 4L)
    assert(u.getDouble(2) == 0.25 && u.getDouble(3) == 0.0)
    // counts {a:1, b:3}: ranked 1·1 + 2·3 = 7 → gini (14−12)/8 = 0.25
    val skew = (Seq((Some(1L), "r")) ++ (1 to 3).map(_ => (Some(2L), "r")))
      .toDF("k", "v")
    val s = Profile.keySkew(skew, "k").collect().head
    assert(s.getDouble(2) == 0.75 && s.getDouble(3) == 0.25)
    // a null key skews a join like any other — it must be counted
    val withNull = (Seq((None: Option[Long], "r"), (None, "r")) ++
      Seq((Some(1L), "r"))).toDF("k", "v")
    val n = Profile.keySkew(withNull, "k").collect().head
    assert(n.getLong(1) == 2L && n.getDouble(2) == 0.666667)
  }

  test("oov rate: deterministic top-V cut, occurrence counting, empty docs kept") {
    import spark.implicits._
    // counts: a:4, b:3, c:2, d:1 → topV=2 vocab {a, b}
    val docs = Seq(
      (1L, "a a b c"),     // 1 OOV occurrence of c → 0.25
      (2L, "a b b c d"),   // c + d → 0.4
      (3L, "a"),           // fully covered
      (4L, ""))            // empty → (0, 0, 0.0)
      .toDF("doc_id", "text")
    val got = Profile.oovRate(docs, "text", "doc_id", topV = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      1L -> ((4L, 1L, 0.25)),
      2L -> ((5L, 2L, 0.4)),
      3L -> ((1L, 0L, 0.0)),
      4L -> ((0L, 0L, 0.0))))
  }

  test("source redundancy: duplicate of an earlier doc counts against the LATER doc's source") {
    import spark.implicits._
    val docs = Seq(
      (1L, "shared text", "srcA"),
      (2L, "shared text", "srcB"),   // dup of 1 → charged to srcB
      (3L, "unique one", "srcB"),
      (4L, "shared text", "srcB"))   // another dup → srcB
      .toDF("doc_id", "text", "source")
    val got = Profile.sourceRedundancy(docs, "text", "doc_id", "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      "srcA" -> ((1L, 0L, 0.0)),
      "srcB" -> ((3L, 2L, 0.666667))))
  }

  test("corrMatrix: perfect linear pair hits ±1, constant column yields NULL, nulls pairwise-excluded") {
    import spark.implicits._
    val df = Seq(
      (1.0, 2.0, Some(5.0), 7.0),
      (2.0, 4.0, Some(5.0), 6.0),
      (3.0, 6.0, None, 5.0),
      (4.0, 8.0, Some(5.0), 4.0))
      .toDF("a", "b", "c", "d")
    val out = Profile.corrMatrix(df,
        Seq("a" -> 1000000L, "b" -> 1000000L, "c" -> 1000000L, "d" -> 1000000L))
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("a", "b")) == ((4L, Some(1.0))))    // b = 2a exactly
    assert(out(("a", "d")) == ((4L, Some(-1.0))))   // d = 8 - a
    assert(out(("a", "c")) == ((3L, None)))         // c constant → no variance
    assert(out(("c", "d"))._1 == 3L)                // null row excluded per pair
  }

  test("benford: integer-cents leading digits, zero excluded, χ² from the same µ-terms") {
    import spark.implicits._
    // cents: 100,100,100 → digit 1; 250 → 2; 999 → 9; 0.005 → 0 cents,
    // excluded. N = 5.
    val df = Seq(1.0, 1.0, 1.0, 2.5, 9.99, 0.005).toDF("v")
    val out = Profile.benford(df, "v")
      .as[(Int, Long, Option[Double], Double, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out.size == 9)
    assert(out(1)._1 == 3L && out(1)._2.contains(0.6))
    assert(out(2)._1 == 1L && out(9)._1 == 1L && out(5)._1 == 0L)
    assert(out(1)._3 == 0.30103)   // round(log10(2), 6)
    // χ² mirrored independently from the published micro table:
    val obs = Map(1 -> 3L, 2 -> 1L, 9 -> 1L).withDefaultValue(0L)
    val tmics = (1 to 9).map { d =>
      val e = (5L * Profile.BenfordMicros(d - 1)).toDouble / 1000000.0
      math.round(1000000.0 * ((obs(d) - e) * (obs(d) - e) / e))
    }
    val expected = BigDecimal(tmics.sum.toDouble / 1000000.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1)._4.contains(expected))
    assert(out.values.map(_._4).toSet.size == 1) // chi2 identical on all rows
  }

  test("featureMi: identical columns score ln 2, independent/constant pairs score 0") {
    import spark.implicits._
    // x = y (perfect dependence, uniform binary): MI = ln 2 — with the
    // micro-nat quantization, 2·round(1e6·0.5·ln 2) = 693148 µnats.
    val df = Seq(("a", "a", "k"), ("a", "a", "k"), ("b", "b", "k"),
      ("b", "b", "k")).toDF("x", "y", "z")
    val out = Profile.featureMi(df, Seq("x", "y", "z"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("x", "y")) == ((2L, 0.693148)))
    assert(out(("x", "z")) == ((2L, 0.0)))
    assert(out(("y", "z")) == ((2L, 0.0)))
  }

  test("kAnonymity: class-size histogram with NULL QIs forming their own class") {
    import spark.implicits._
    // classes: (a,x)×3, (a,y)×2, (b,x)×1, (NULL,x)×2  → k-hist: 1→1, 2→2, 3→1
    val df = Seq(
      (Some("a"), "x"), (Some("a"), "x"), (Some("a"), "x"),
      (Some("a"), "y"), (Some("a"), "y"),
      (Some("b"), "x"),
      (None, "x"), (None, "x"))
      .toDF("qi1", "qi2")
    val out = Profile.kAnonymity(df, Seq("qi1", "qi2"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 0.125),
      (2L, 2L, 4L, 0.5),
      (3L, 1L, 3L, 0.375)))
  }

  test("vocabCoverage: rank-cut token mass per k; over-budget k covers all") {
    import spark.implicits._
    // corpus "a a a b b c": ranks a(3) b(2) c(1), 6 tokens.
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = graft.operators.Profile
      .vocabCoverage(docs, "text", "doc_id", ks = Seq(1, 2, 10))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 3L, 3L, 6L, 0.5),
      (2L, 3L, 5L, 6L, 0.833333),
      (10L, 3L, 6L, 6L, 1.0)))
  }

  test("lDiversity: homogeneous classes surface at l=1 regardless of their k") {
    import spark.implicits._
    // class 1: sensitive {x,x,y} → l=2 over 3 rows; class 2: {x,x} →
    // l=1 (k-anonymous at k=2 but fully homogeneous); class 3: {z} → l=1.
    val df = Seq((1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"), (2L, "x"),
      (3L, "z")).toDF("qi", "sv")
    val out = graft.operators.Profile.lDiversity(df, Seq("qi"), "sv")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 2L, 3L, 0.5), (2L, 1L, 3L, 0.5)))
  }

  test("dpNoisedCounts: deterministic, clamped at zero, ε controls noise") {
    import spark.implicits._
    val df = (1L to 40L).map(i => ("k" + (i % 4))).toDF("k")

    def run(eps: Double, salt: String = "dp") =
      graft.operators.Profile.dpShapedCountsReplay(df, "k", eps, salt)
        .as[(String, Long)].collect().sortBy(_._1).toSeq

    // The publication path requires a salt (a defaulted salt is public
    // by definition → no privacy) and is the same mechanism: keyed with
    // the same salt it must produce the identical release.
    intercept[IllegalArgumentException] {
      graft.operators.Profile.dpNoisedCounts(df, "k", 0.5, secretSalt = "")
    }
    assert(graft.operators.Profile.dpNoisedCounts(df, "k", 0.5, "sekrit")
      .as[(String, Long)].collect().sortBy(_._1).toSeq ==
      run(0.5, salt = "sekrit"))

    // Reproducible release: the draw is a pure function of (salt, key).
    val a = run(0.5)
    assert(a == run(0.5))
    // Non-negative by construction even at privacy-heavy ε.
    val tight = run(0.02)
    assert(tight.forall(_._2 >= 0L))
    // The noise actually perturbs: at ε=0.02 (noise scale 50) at least
    // one of the 4 true counts (all exactly 10) must move.
    assert(tight.exists(_._2 != 10L))
    // A different salt is a different release.
    assert(run(0.5) != run(0.5, salt = "dp2") ||
      run(0.02) != run(0.02, salt = "dp2"))
    // Looser ε=5 (noise scale 0.2): every released count within 1 of
    // the true 10 — utility returns as ε grows.
    assert(run(5.0).forall(r => math.abs(r._2 - 10L) <= 1L))
  }

  test("giniConcentration: zero for uniform mass, hand-worked skew, degenerate single group") {
    import spark.implicits._
    // sizes [1, 9]: G = (2·(1·1 + 2·9) − 3·10) / (2·10) = 8/20 = 0.4
    val skew = (Seq.fill(1)("a") ++ Seq.fill(9)("b")).toDF("src")
    val rs = graft.operators.Profile.giniConcentration(skew, "src")
      .as[(Long, Long, Double, Double)].head()
    assert(rs == ((2L, 10L, 0.4, 0.9)))
    // perfectly uniform mass → 0 regardless of group count
    val unif = (1 to 30).map(i => "g" + (i % 5)).toDF("src")
    assert(graft.operators.Profile.giniConcentration(unif, "src")
      .as[(Long, Long, Double, Double)].head()._3 == 0.0)
    // a single group is trivially uniform
    assert(graft.operators.Profile.giniConcentration(
      Seq("x", "x", "x").toDF("src"), "src")
      .as[(Long, Long, Double, Double)].head() == ((1L, 3L, 0.0, 1.0)))
  }

  test("tokenWeightedQuantiles: token mass pins the quantiles, not doc counts") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.{QualityFilters, TextAnalysis}
    // group g: one LONG document vs three short ones — by docs the
    // short kind is the 75% majority; by tokens the long doc dominates.
    val longText = ("sustained analysis of measured outcomes across " +
      "several independent trials ") * 30
    val shortText = "ok ok ok"
    val docs = (Seq((1L, "g", longText)) ++
      (2L to 4L).map(i => (i, "g", shortText)))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Profile
      .tokenWeightedQuantiles(docs, "text", "doc_id", "lang")
      .as[(String, Long, Long, Double, Double, Double)].head()
    // the long doc's own score — computed through the same public API
    val longScore = docs.filter(col("doc_id") === 1L)
      .select(QualityFilters.classifierScoreOf(
        TextAnalysis.tokens(col("text"))).as("s"))
      .as[Double].head()
    val shortScore = docs.filter(col("doc_id") === 2L)
      .select(QualityFilters.classifierScoreOf(
        TextAnalysis.tokens(col("text"))).as("s"))
      .as[Double].head()
    assert(out._2 == 4L)
    // the long doc carries ~98% of the token mass → every quantile
    // lands on ITS score (a doc-weighted p50 would pick the short one)
    assert(out._4 == longScore && out._5 == longScore && out._6 == longScore)
    assert(longScore != shortScore)
    // ordering invariant on a mixed group
    val mixed = (1L to 9L).map(i =>
      (i, "m", ("tok" + i.toString + " word other lex entry") * (1 + i.toInt % 4)))
      .toDF("doc_id", "lang", "text")
    val m = graft.operators.Profile
      .tokenWeightedQuantiles(mixed, "text", "doc_id", "lang")
      .as[(String, Long, Long, Double, Double, Double)].head()
    assert(m._4 <= m._5 && m._5 <= m._6)
  }
}
