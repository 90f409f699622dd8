package graft.operators

import org.apache.spark.sql.DataFrame
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
}
