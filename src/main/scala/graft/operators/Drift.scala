package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Per-source distribution drift: KL(source ‖ corpus) over the unigram
  * token distribution — the standard mixture-monitoring diagnostic for
  * a multi-source training corpus (which slices are drifting away from
  * the blend they're supposed to contribute to).
  *
  * KL(P_s ‖ Q) = Σ_t p_st · ln(p_st / q_t), summed over the source's
  * tokens within the corpus-frequency-restricted vocabulary
  * (count ≥ minCount): the corpus is a superset of every source, so
  * q_t > 0 wherever p_st > 0 and no smoothing is needed.
  *
  * Scale shape: one explode feeds two hash aggregates (corpus vocab and
  * per-source counts — both vocabulary-sized outputs, not corpus-sized),
  * the count join is token-keyed, and the totals (per-source M_s, the
  * single N) are broadcast 1-row/|sources|-row aggregates. The KL sum
  * itself uses the exact-integer trick ([[Pca]], EventStats): each term
  * is quantized to 1e-12 quanta and summed as BIGINTs, so aggregation
  * order cannot perturb the result and the DuckDB oracle matches
  * exactly. All log inputs are ratios of exact integers (< 2⁵³ as
  * doubles), so both engines evaluate ln on bitwise-identical inputs.
  *
  * Output: (source, n_vocab, m_tokens, kl), kl to 6 dp.
  */
object Drift {

  /** 1e-12 KL quanta: |term| ≤ ln(N) ≈ 40, ×1e12 ≈ 4e13 per term,
    * × a 10⁵-token vocabulary ≈ 4e18 — inside Long for any one source.
    */
  val Quantum = 1.0e12

  /** The restricted-vocabulary size the [[Quantum]] overflow envelope is
    * derived for — ENFORCED at runtime (not just documented): beyond it
    * the BIGINT term sum may overflow (an opaque ANSI error on the Spark
    * side, a silent wrap in a non-ANSI oracle). A larger vocabulary
    * needs a larger `minCount` or a smaller quantum.
    */
  val MaxVocabPerSource = 100000L

  def sourceKl(docs: DataFrame, textCol: String, srcCol: String,
               minCount: Int): DataFrame = {
    val tok = Dedup.rebalance(docs)
      .select(col(srcCol), explode(TextAnalysis.tokens(col(textCol))).as("_t"))
    val vocab = tok.groupBy(col("_t")).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= minCount)
    val srcCounts = tok.groupBy(col(srcCol), col("_t"))
      .agg(count(lit(1)).as("_m"))
    val joined = srcCounts.join(vocab, "_t")
    val n = vocab.agg(sum(col("_n")).as("_nTot"))
    val m = joined.groupBy(col(srcCol)).agg(sum(col("_m")).as("_mTot"))
    val term = floor(
      col("_m").cast("double") / col("_mTot").cast("double") *
        log(col("_m").cast("double") * col("_nTot").cast("double") /
            (col("_n").cast("double") * col("_mTot").cast("double"))) *
        Quantum + 0.5).cast("long")
    joined
      .join(broadcast(m), srcCol)
      .crossJoin(broadcast(n))
      .groupBy(col(srcCol))
      .agg(
        count(lit(1)).as("n_vocab"),
        max(col("_mTot")).as("m_tokens"),
        round(sum(term) / Quantum, 6).as("kl"))
      // Runtime guard on the documented overflow envelope: assert_true
      // rides inside the n_vocab projection (null on success, throws
      // with the actionable message otherwise) so it cannot be pruned
      // and costs nothing beyond the per-source comparison.
      .select(col(srcCol),
        when(assert_true(col("n_vocab") <= MaxVocabPerSource,
            concat(lit("Drift.sourceKl: restricted vocabulary "),
              col("n_vocab"),
              lit(s" exceeds the 1e-12-quantum Long-overflow bound " +
                s"$MaxVocabPerSource; raise minCount or shrink Quantum")))
          .isNull, col("n_vocab")).as("n_vocab"),
        col("m_tokens"), col("kl"))
  }

  /** EMBEDDING-space drift: cosine of each group's centroid against the
    * whole-corpus centroid — the semantic sibling of [[sourceKl]]
    * (token drift says a slice's vocabulary moved; centroid drift says
    * its MEANING moved, catching paraphrase-level shifts token counts
    * cannot see). A group whose centroid_cos sinks is contributing
    * off-blend content.
    *
    * Scale shape: one posexplode feeds one (group, component) hash
    * aggregate — output is groups×dim rows, never corpus-sized; the
    * global centroid derives from the SAME aggregate (no second scan).
    * Determinism: components are quantized to 1e-6 quanta and summed as
    * BIGINTs (the [[Pca]] exact-integer trick — sums ≤ 1e6·n stay
    * inside Long to n ≈ 9e12 vectors), so centroids are exact rationals
    * both engines compute bitwise-identically; the cosine folds in
    * ascending component order on both sides.
    *
    * Output: (grpCol, n_vectors, centroid_cos to 6 dp).
    */
  def embeddingDrift(vecs: DataFrame, vecCol: String, grpCol: String): DataFrame = {
    val Q = 1.0e6
    val qcomp = Dedup.rebalance(vecs)
      .select(col(grpCol), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .select(col(grpCol), col("pos"),
        floor(col("_v").cast("double") * Q + 0.5).cast("long").as("_q"))
    val byGrp = qcomp.groupBy(col(grpCol), col("pos"))
      .agg(sum(col("_q")).as("_sq"), count(lit(1)).as("_n"))
    val global = byGrp.groupBy(col("pos"))
      .agg(sum(col("_sq")).as("_gsq"), sum(col("_n")).as("_gn"))
    // global is dim rows — broadcast it; the (group, component) side
    // never re-shuffles for the join.
    val joined = byGrp.join(broadcast(global), "pos")
      .withColumn("_c", col("_sq").cast("double") / (col("_n").cast("double") * Q))
      .withColumn("_g", col("_gsq").cast("double") / (col("_gn").cast("double") * Q))
    val arr = array_sort(collect_list(struct(col("pos"), col("_c"), col("_g"))))
    def fold(f: Column => Column) =
      aggregate(col("_arr"), lit(0.0), (acc, s) => acc + f(s))
    joined.groupBy(col(grpCol))
      .agg(max(col("_n")).as("n_vectors"), arr.as("_arr"))
      .select(col(grpCol), col("n_vectors"),
        round(
          fold(s => s.getField("_c") * s.getField("_g")) /
            (sqrt(fold(s => s.getField("_c") * s.getField("_c"))) *
             sqrt(fold(s => s.getField("_g") * s.getField("_g")))), 6)
          .as("centroid_cos"))
  }

  /** DuckDB oracle for [[embeddingDrift]]: identical quantization,
    * exact-integer centroid sums, ascending-component cosine fold.
    */
  def duckEmbeddingDrift(tbl: String, vecCol: String, grpCol: String,
                         dim: Int): String =
    s"""WITH x AS (
       |  SELECT $grpCol, pos,
       |         CAST(floor(CAST($vecCol AS DOUBLE[])[pos] * 1000000.0 + 0.5)
       |              AS BIGINT) AS q
       |  FROM $tbl, range(1, ${dim + 1}) t(pos)),
       |bg AS (SELECT $grpCol, pos, sum(q) AS sq, count(*) AS n
       |       FROM x GROUP BY $grpCol, pos),
       |g AS (SELECT pos, sum(sq) AS gsq, sum(n) AS gn FROM bg GROUP BY pos),
       |j AS (SELECT $grpCol, pos, n,
       |             CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS c,
       |             CAST(gsq AS DOUBLE) / (CAST(gn AS DOUBLE) * 1000000.0) AS gc
       |      FROM bg JOIN g USING (pos)),
       |f AS (SELECT $grpCol, CAST(max(n) AS BIGINT) AS n_vectors,
       |             list(c ORDER BY pos) AS lc, list(gc ORDER BY pos) AS lg
       |      FROM j GROUP BY $grpCol)
       |SELECT $grpCol, n_vectors,
       |       round(list_dot_product(lc, lg) /
       |             (sqrt(list_dot_product(lc, lc)) *
       |              sqrt(list_dot_product(lg, lg))), 6) AS centroid_cos
       |FROM f""".stripMargin

  /** Pairwise centroid-cosine matrix between groups — the semantic
    * REDUNDANCY map next to [[embeddingDrift]]'s off-blend alarm: drift
    * compares each group to the pool; this compares groups to EACH
    * OTHER, answering "which two sources say the same thing" (merge or
    * downweight candidates) and "which group is the semantic outlier"
    * (its row of cosines is uniformly low). The full matrix is
    * group-pair-sized — trivially small for sources/labels/shards even
    * when the corpus is 100 TB.
    *
    * Same exactness discipline as [[embeddingDrift]]: 1e-6-quantized
    * components summed as exact BIGINTs in ONE (group, component)
    * aggregate; centroid cosines fold in ascending component order on
    * both engines. One corpus pass; the pairwise join runs on the
    * groups-sized folded frame.
    *
    * Output per unordered pair (grp_a < grp_b): (grp_a, grp_b, n_a,
    * n_b, centroid_cos).
    */
  def centroidSimMatrix(vecs: DataFrame, vecCol: String,
                        grpCol: String): DataFrame = {
    val Q = 1.0e6
    val qcomp = Dedup.rebalance(vecs)
      .select(col(grpCol).as("_g"), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .select(col("_g"), col("pos"),
        floor(col("_v").cast("double") * Q + 0.5).cast("long").as("_q"))
    val byGrp = qcomp.groupBy(col("_g"), col("pos"))
      .agg(sum(col("_q")).as("_sq"), count(lit(1)).as("_n"))
      .withColumn("_c",
        col("_sq").cast("double") / (col("_n").cast("double") * lit(Q)))
    val folded = byGrp.groupBy(col("_g"))
      .agg(max(col("_n")).as("_nv"),
        array_sort(collect_list(struct(col("pos"), col("_c")))).as("_arr"))
    def dot(a: Column, b: Column) = aggregate(
      zip_with(a, b, (s, t) => s.getField("_c") * t.getField("_c")),
      lit(0.0), (acc, v) => acc + v)
    folded.as("x").join(folded.as("y"), col("x._g") < col("y._g"))
      .select(col("x._g").as("grp_a"), col("y._g").as("grp_b"),
        col("x._nv").as("n_a"), col("y._nv").as("n_b"),
        round(dot(col("x._arr"), col("y._arr"))
          / (sqrt(dot(col("x._arr"), col("x._arr")))
            * sqrt(dot(col("y._arr"), col("y._arr")))), 6)
          .as("centroid_cos"))
  }

  /** DuckDB oracle for [[centroidSimMatrix]] — identical quantization
    * and component-ordered folds, pairwise join on the groups-sized
    * folded frame.
    */
  def duckCentroidSimMatrix(tbl: String, vecCol: String, grpCol: String,
                            dim: Int): String =
    s"""WITH x AS (
       |  SELECT $grpCol AS g, pos,
       |         CAST(floor(CAST($vecCol AS DOUBLE[])[pos] * 1000000.0 + 0.5)
       |              AS BIGINT) AS q
       |  FROM $tbl, range(1, ${dim + 1}) t(pos)),
       |bg AS (SELECT g, pos, sum(q) AS sq, count(*) AS n
       |       FROM x GROUP BY g, pos),
       |f AS (SELECT g, CAST(max(n) AS BIGINT) AS nv,
       |             list(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
       |                  ORDER BY pos) AS lc
       |      FROM bg GROUP BY g)
       |SELECT a.g AS grp_a, b.g AS grp_b, a.nv AS n_a, b.nv AS n_b,
       |       round(list_dot_product(a.lc, b.lc) /
       |             (sqrt(list_dot_product(a.lc, a.lc)) *
       |              sqrt(list_dot_product(b.lc, b.lc))), 6) AS centroid_cos
       |FROM f a JOIN f b ON a.g < b.g""".stripMargin

  /** Within-group embedding ALIGNMENT — the exact mean pairwise cosine
    * of every group, WITHOUT enumerating pairs: for unit-normalized
    * vectors (the corpus contract, FIXTURES.md)
    *
    *   mean_{i≠j} xᵢ·xⱼ = (‖Σx‖² − Σ‖x‖²) / (n·(n−1))
    *
    * — the contrastive-representation diagnostic (Wang & Isola 2020's
    * "alignment"): high = the group's embeddings agree (a coherent
    * topic/source), near 0 = the group is semantically incoherent, and
    * a group whose alignment rivals the dedup threshold is a semantic
    * near-dup CLUSTER in disguise. The identity is what makes this a
    * 100 TB operator: the naive mean pairwise cosine is n² per group,
    * this is ONE corpus pass.
    *
    * Exactness: per-component 1e-6-quantized sums S_pos and squared
    * sums Q2_pos are exact BIGINTs from one (group, component)
    * aggregate; the numerator Σ S² − Σ Q2 stays an exact DECIMAL
    * integer in µ² units — ONE double division at the end. Singleton
    * groups have no pairs → NULL alignment.
    *
    * Output: (grpCol, n_vectors, alignment).
    */
  def withinGroupAlignment(vecs: DataFrame, vecCol: String,
                           grpCol: String): DataFrame = {
    val Q = 1.0e6
    def d38(c: Column) = c.cast("decimal(38,0)")
    val qcomp = Dedup.rebalance(vecs)
      .select(col(grpCol), posexplode(col(vecCol)).as(Seq("pos", "_v")))
      .select(col(grpCol), col("pos"),
        floor(col("_v").cast("double") * Q + 0.5).cast("long").as("_q"))
    val byGrp = qcomp.groupBy(col(grpCol), col("pos"))
      .agg(sum(col("_q")).as("_s"),
        sum(d38(col("_q")) * d38(col("_q"))).as("_q2"),
        count(lit(1)).as("_n"))
    byGrp.groupBy(col(grpCol))
      .agg(max(col("_n")).as("n_vectors"),
        sum(d38(col("_s")) * d38(col("_s"))).as("_ss"),
        sum(col("_q2")).as("_sq2"))
      .select(col(grpCol), col("n_vectors"),
        when(col("n_vectors") < 2L, lit(null).cast("double"))
          .otherwise(round(
            (col("_ss") - col("_sq2")).cast("double")
              / (col("n_vectors") * (col("n_vectors") - 1L)).cast("double")
              / lit(1e12), 6)).as("alignment"))
  }

  /** DuckDB oracle for [[withinGroupAlignment]] — identical quantized
    * exact sums and the same single division.
    */
  def duckWithinGroupAlignment(tbl: String, vecCol: String, grpCol: String,
                               dim: Int): String =
    s"""WITH x AS (
       |  SELECT $grpCol, pos,
       |         CAST(floor(CAST($vecCol AS DOUBLE[])[pos] * 1000000.0 + 0.5)
       |              AS BIGINT) AS q
       |  FROM $tbl, range(1, ${dim + 1}) t(pos)),
       |bg AS (SELECT $grpCol, pos, sum(CAST(q AS HUGEINT)) AS s,
       |              sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS q2,
       |              CAST(count(*) AS BIGINT) AS n
       |       FROM x GROUP BY $grpCol, pos),
       |g AS (SELECT $grpCol, CAST(max(n) AS BIGINT) AS n_vectors,
       |             sum(s * s) AS ss, sum(q2) AS sq2
       |      FROM bg GROUP BY $grpCol)
       |SELECT $grpCol, n_vectors,
       |       CASE WHEN n_vectors >= 2 THEN
       |         round(CAST(ss - sq2 AS DOUBLE)
       |               / CAST(n_vectors * (n_vectors - 1) AS DOUBLE)
       |               / 1e12, 6) END AS alignment
       |FROM g""".stripMargin

  /** DuckDB oracle for [[sourceKl]] — identical vocabulary restriction,
    * totals, quantized terms, and rounding.
    */
  def duckSourceKl(tbl: String, textCol: String, srcCol: String,
                   minCount: Int): String = {
    val q = "1000000000000.0"
    s"""WITH d AS (SELECT $srcCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |tok AS (SELECT $srcCol, unnest(w) AS t FROM d),
       |vocab AS (SELECT t, count(*) AS n FROM tok GROUP BY t HAVING count(*) >= $minCount),
       |src AS (SELECT $srcCol, t, count(*) AS m FROM tok GROUP BY $srcCol, t),
       |j AS (SELECT * FROM src JOIN vocab USING (t)),
       |ntot AS (SELECT sum(n) AS n_tot FROM vocab),
       |mtot AS (SELECT $srcCol, sum(m) AS m_tot FROM j GROUP BY $srcCol)
       |SELECT $srcCol,
       |       count(*) AS n_vocab,
       |       CAST(max(m_tot) AS BIGINT) AS m_tokens,
       |       round(sum(CAST(floor(
       |         CAST(m AS DOUBLE) / CAST(m_tot AS DOUBLE) *
       |           ln(CAST(m AS DOUBLE) * CAST(n_tot AS DOUBLE) /
       |              (CAST(n AS DOUBLE) * CAST(m_tot AS DOUBLE))) *
       |           $q + 0.5) AS BIGINT)) / $q, 6) AS kl
       |FROM j JOIN mtot USING ($srcCol) CROSS JOIN ntot
       |GROUP BY $srcCol""".stripMargin
  }

  /** PSI bucket count for [[scorePsi]]: classifier scores live in
    * (0, 1), so ten equal-width buckets are the standard monitoring
    * grid (no bounds pass needed).
    */
  val PsiBuckets = 10

  /** POPULATION STABILITY INDEX of the quality-score distribution
    * between two corpus slices — the standard "did my scorer's input
    * distribution move" monitor for deployed ML filters (PSI < 0.1
    * stable, > 0.25 action):
    *
    *   PSI = Σ_buckets (p_A − p_B) · ln(p_A / p_B)
    *
    * over the fixed [[PsiBuckets]] grid with ADD-ONE smoothing (every
    * bucket contributes on both sides, so empty buckets need no
    * epsilon special-case and the estimator is a total function).
    * Complements [[sourceKl]] (token-distribution drift) with
    * score-distribution drift.
    *
    * Scale shape: one narrow scoring pass collapses map-side to 10
    * bucket rows; everything after is constant-size. Float parity: the
    * per-bucket term is quantized to 1e-12 BIGINTs ([[Quantum]]) and
    * summed in integers — bucket order cannot move the result.
    * Output: one row (n_a, n_b, psi).
    */
  def scorePsi(docs: DataFrame, textCol: String, sideACol: Column): DataFrame = {
    import graft.functions.{QualityFilters, TextAnalysis}
    val b = docs
      .withColumn("_w", TextAnalysis.tokens(col(textCol)))
      .select(QualityFilters.classifierScoreOf(col("_w")).as("_s"),
        sideACol.cast("boolean").as("_a"))
      .select(least(floor(col("_s") * PsiBuckets), lit((PsiBuckets - 1).toLong))
        .cast("long").as("bucket"), col("_a"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("_a"), 0L).otherwise(1L)).as("cb"))
    // dense 10-bucket grid: absent buckets still contribute under
    // add-one smoothing whenever the side totals differ
    val grid = docs.sparkSession.range(PsiBuckets)
      .select(col("id").as("bucket"))
    val counts = grid.join(b, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"))
    val pa = (col("ca") + 1L).cast("double") / (col("n_a") + PsiBuckets).cast("double")
    val pb = (col("cb") + 1L).cast("double") / (col("n_b") + PsiBuckets).cast("double")
    counts.crossJoin(broadcast(tot))
      .select(col("n_a"), col("n_b"),
        floor((pa - pb) * log(pa / pb) * Quantum + 0.5).cast("long").as("_tq"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("_tq")).as("_q"))
      .select(col("n_a"), col("n_b"),
        round(col("_q").cast("double") / Quantum, 6).as("psi"))
  }

  /** DuckDB oracle twin of [[scorePsi]]; `sideASql` is the boolean SQL
    * of the A-side predicate.
    */
  def duckScorePsi(tbl: String, textCol: String, sideASql: String): String = {
    import graft.functions.{QualityFilters, TextAnalysis}
    val k = PsiBuckets
    s"""WITH d AS (SELECT ${TextAnalysis.duckTokensBind(textCol)} AS w,
       |                  ($sideASql) AS a FROM $tbl),
       |s AS (SELECT CAST(least(floor(${QualityFilters.duckClassifierScore} * $k), ${k - 1}) AS BIGINT) AS bucket, a FROM d),
       |c0 AS (SELECT bucket, CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |              CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
       |       FROM s GROUP BY 1),
       |g AS (SELECT CAST(range AS BIGINT) AS bucket FROM range($k)),
       |c AS (SELECT g.bucket, coalesce(c0.ca, 0) AS ca, coalesce(c0.cb, 0) AS cb
       |      FROM g LEFT JOIN c0 ON c0.bucket = g.bucket),
       |t AS (SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM c)
       |SELECT n_a, n_b,
       |       round(CAST(sum(CAST(floor(
       |         ((CAST(ca + 1 AS DOUBLE) / CAST(n_a + $k AS DOUBLE))
       |          - (CAST(cb + 1 AS DOUBLE) / CAST(n_b + $k AS DOUBLE))) *
       |         ln((CAST(ca + 1 AS DOUBLE) / CAST(n_a + $k AS DOUBLE))
       |            / (CAST(cb + 1 AS DOUBLE) / CAST(n_b + $k AS DOUBLE))) *
       |         $Quantum + 0.5) AS BIGINT)) AS DOUBLE) / $Quantum, 6) AS psi
       |FROM c, t GROUP BY n_a, n_b""".stripMargin
  }
}
