package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Gopher-style document quality / repetition filters (Rae et al. 2021,
  * "Scaling Language Models", table A1; also C4 / RefinedWeb heuristics):
  * mean word length, unique-word ratio, top-word frequency ratio, and
  * duplicate-2-gram ratio, combined into a keep/drop verdict. These are
  * the standard pre-training corpus filters applied before dedup.
  *
  * Everything is pure `Column` composition over built-in higher-order
  * functions (no UDFs — stays inside whole-stage codegen), computed
  * against a token array bound ONCE in the enclosing projection
  * ([[TextAnalysis.tokens]]). Per-row cost is O(tokens · distinct) for
  * the top-word scan — bounded by document length, embarrassingly
  * parallel, no shuffle anywhere: at 100 TB this is a narrow map over
  * the scan, exactly the shape you want.
  *
  * Engine parity (same rules as [[TextAnalysis]]): integer counts until
  * one final double division, `round(·, 6)` on every emitted double;
  * each formula has a `duck*` twin rendered from the same constants.
  */
object QualityFilters {

  /** Keep/drop thresholds (tuned so both classes are non-empty on the
    * synthetic corpus; a production pipeline would fit them per-source).
    */
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MinUniqRatio = 0.33
  val MaxTopWordRatio = 0.2
  val MaxDup2gramRatio = 0.1

  // ---------------------------------------------------------------- Spark
  // All four features read the single-pass native counts struct
  // (org.apache.spark.sql.graft.GopherCounts, r14): the counts are
  // exact integers, the ratio/guard/round math below is unchanged
  // Column code, so emitted values are bit-identical to the prior HOF
  // formulations (kept below as *OfHof, NativeExprSpec parity gates).
  // Identical counts(w) subtrees CSE inside whole-stage codegen.

  private def countsOf(w: Column): Column =
    org.apache.spark.sql.graft.GopherCounts(w)

  /** Mean word length: Σ len(token) / n_tokens (0 for empty docs). */
  def meanWordLenOf(w: Column): Column =
    round(when(size(w) === 0, 0.0).otherwise(
      countsOf(w).getField("sum_len")
        .cast("double") / size(w).cast("double")), 6)

  /** HOF reference formulation of [[meanWordLenOf]] (parity gate). */
  private[graft] def meanWordLenOfHof(w: Column): Column =
    round(when(size(w) === 0, 0.0).otherwise(
      aggregate(w, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(w).cast("double")), 6)

  /** Unique-word ratio: |distinct tokens| / n_tokens (0 for empty). */
  def uniqWordRatioOf(w: Column): Column =
    round(when(size(w) === 0, 0.0).otherwise(
      countsOf(w).getField("n_uniq").cast("double") / size(w).cast("double")), 6)

  /** HOF reference formulation of [[uniqWordRatioOf]] (parity gate). */
  private[graft] def uniqWordRatioOfHof(w: Column): Column =
    round(when(size(w) === 0, 0.0).otherwise(
      size(array_distinct(w)).cast("double") / size(w).cast("double")), 6)

  /** Top-word ratio: max single-token frequency / n_tokens. */
  def topWordRatioOf(w: Column): Column =
    round(when(size(w) === 0, 0.0).otherwise(
      countsOf(w).getField("top_freq")
        .cast("double") / size(w).cast("double")), 6)

  /** HOF reference formulation of [[topWordRatioOf]] — the O(distinct ·
    * n) interpreted scan the native counts replaced (parity gate).
    */
  private[graft] def topWordRatioOfHof(w: Column): Column =
    round(when(size(w) === 0, 0.0).otherwise(
      array_max(transform(array_distinct(w),
        x => size(filter(w, t => t === x))))
        .cast("double") / size(w).cast("double")), 6)

  /** Word 2-grams of a token array (positional, duplicates kept —
    * repetition is exactly what we are measuring). Guarded: Spark's
    * `sequence(1, 0)` would generate a DESCENDING range, so short docs
    * short-circuit to an empty array before the sequence is built.
    * (Parity-reference helper; the shipped ratio reads the native
    * counts.)
    */
  def bigramsOf(w: Column): Column =
    when(size(w) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(w) - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))

  /** Duplicate-2-gram ratio: 1 − |distinct 2-grams| / |2-grams| (the
    * Gopher repetition signal; 0 for docs shorter than 2 tokens).
    */
  def dup2gramRatioOf(w: Column): Column =
    round(when(size(w) < 2, 0.0).otherwise(
      lit(1.0) - countsOf(w).getField("uniq_bigrams").cast("double")
        / (size(w) - 1).cast("double")), 6)

  /** HOF reference formulation of [[dup2gramRatioOf]] (parity gate). */
  private[graft] def dup2gramRatioOfHof(w: Column): Column =
    round(when(size(w) < 2, 0.0).otherwise(
      lit(1.0) - size(array_distinct(bigramsOf(w))).cast("double")
        / (size(w) - 1).cast("double")), 6)

  /** Combined keep verdict as 0/1 (BIGINT both engines — booleans hash
    * differently across engines, longs do not).
    */
  def keepOf(w: Column): Column = {
    val mw = meanWordLenOf(w)
    (mw >= MinMeanWordLen && mw <= MaxMeanWordLen &&
      uniqWordRatioOf(w) >= MinUniqRatio &&
      topWordRatioOf(w) <= MaxTopWordRatio &&
      dup2gramRatioOf(w) <= MaxDup2gramRatio).cast("long")
  }

  // --------------------------------------------------- DuckDB oracle SQL
  // `w` must be bound in the enclosing query (TextAnalysis.duckTokensBind).

  def duckMeanWordLen: String =
    "round(CASE WHEN len(w) = 0 THEN 0.0 ELSE " +
      "CAST(list_sum(list_transform(w, t -> CAST(length(t) AS BIGINT))) AS DOUBLE) " +
      "/ CAST(len(w) AS DOUBLE) END, 6)"

  def duckUniqWordRatio: String =
    "round(CASE WHEN len(w) = 0 THEN 0.0 ELSE " +
      "CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) END, 6)"

  def duckTopWordRatio: String =
    "round(CASE WHEN len(w) = 0 THEN 0.0 ELSE " +
      "CAST(list_max(list_transform(list_distinct(w), x -> len(list_filter(w, t -> t = x)))) AS DOUBLE) " +
      "/ CAST(len(w) AS DOUBLE) END, 6)"

  def duckBigrams: String =
    "[w[i] || ' ' || w[i+1] for i in range(1, len(w))]"

  def duckDup2gramRatio: String =
    "round(CASE WHEN len(w) < 2 THEN 0.0 ELSE " +
      s"1.0 - CAST(len(list_distinct($duckBigrams)) AS DOUBLE) " +
      "/ CAST(len(w) - 1 AS DOUBLE) END, 6)"

  def duckKeep: String =
    s"CAST(($duckMeanWordLen >= $MinMeanWordLen AND $duckMeanWordLen <= $MaxMeanWordLen " +
      s"AND $duckUniqWordRatio >= $MinUniqRatio " +
      s"AND $duckTopWordRatio <= $MaxTopWordRatio " +
      s"AND $duckDup2gramRatio <= $MaxDup2gramRatio) AS BIGINT)"

  // ------------------------------------------- linear quality classifier

  /** Stand-in weights for a trained fastText/DCLM-style quality model —
    * the PLUMBING (plan-time literal weights, codegen'd linear score,
    * engine-exact features) is the deliverable; swap these for trained
    * coefficients without touching the plan shape. Order:
    * (bias, meanWordLen, uniqRatio, topRatio, dup2gramRatio, lenCap).
    */
  val ClassifierWeights: Seq[Double] = Seq(-2.0, 0.25, 2.5, -3.0, -8.0, 1.5)

  /** Linear quality score σ(w·x) ∈ (0,1) over the Gopher features plus
    * a capped length feature min(n_tokens/100, 1). Every feature is
    * 6 dp-rounded first (engine-identical inputs), the weighted sum is
    * a left-associated literal chain, and only the final sigmoid leans
    * on cross-engine exp() (guarded by the 6 dp output round).
    */
  def classifierScoreOf(w: Column): Column = {
    val Seq(b, wMw, wUniq, wTop, wDup, wLen) = ClassifierWeights
    val lenCap = least(size(w).cast("double") / 100.0, lit(1.0))
    val z = lit(b) + lit(wMw) * meanWordLenOf(w) + lit(wUniq) * uniqWordRatioOf(w) +
      lit(wTop) * topWordRatioOf(w) + lit(wDup) * dup2gramRatioOf(w) +
      lit(wLen) * lenCap
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  /** DuckDB twin of [[classifierScoreOf]]. */
  def duckClassifierScore: String = {
    val Seq(b, wMw, wUniq, wTop, wDup, wLen) = ClassifierWeights
    val lenCap = "least(CAST(len(w) AS DOUBLE) / 100.0, 1.0)"
    val z = s"$b + $wMw * $duckMeanWordLen + $wUniq * $duckUniqWordRatio" +
      s" + $wTop * $duckTopWordRatio + $wDup * $duckDup2gramRatio" +
      s" + $wLen * $lenCap"
    s"round(1.0 / (1.0 + exp(-($z))), 6)"
  }
}
