package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Cross-document duplicated-n-gram fraction — the corpus-level
  * repetition signal (MassiveText / RefinedWeb recipe): for each
  * document, the share of its distinct word n-grams that also occur in
  * at least one OTHER document. High values mark boilerplate, templated
  * pages, and licence walls that per-document repetition stats
  * ([[graft.functions.QualityFilters]]) cannot see, and near-dup pair
  * mining ([[Dedup.minhashLshPairs]]) only catches when whole documents
  * align.
  *
  * Scale shape — SKEW-FREE BY CONSTRUCTION. The naive plan joins the
  * exploded corpus-shingle stream back against the shingle-df table on
  * the shingle key, and stop-shingles ("of the …") are massive hot keys
  * at corpus scale. This implementation never joins on the shingle key:
  *
  *   n_dup(doc) = n_shingles(doc) − n_unique(doc)
  *
  * where a UNIQUE shingle (df = 1) occurs in exactly one document — so
  * `min(doc_id)` inside the df aggregate IS its owner, and per-doc
  * unique counts come from a doc-key aggregate over the df=1 slice. The
  * only shingle-keyed operation left is the hash AGGREGATE, whose
  * map-side partial combine absorbs hot keys by design; the remaining
  * exchanges and the final join are all on the uniformly-distributed
  * doc id. One explode, two hash aggregates, one doc-key join. No
  * window, no sort, no driver data; integral counts until the single
  * output division. (Plan-gated: PlanAuditSpec asserts no shingle-keyed
  * join.)
  */
object Novelty {

  /** Per-document duplicated-shingle stats.
    * Output: (idCol, n_shingles, n_dup, dup_frac) — `dup_frac` is the
    * fraction of the doc's distinct n-grams seen in ≥ 1 other doc.
    */
  def crossDocDupFraction(docs: DataFrame, textCol: String, idCol: String,
                          n: Int): DataFrame = {
    // shingles() emits DISTINCT n-grams per doc, so df below counts
    // documents containing the shingle, not occurrences — and the
    // per-doc denominator is just the array size (narrow, no explode).
    val base = Dedup.rebalance(docs)
      .select(col(idCol), Dedup.shingleFps(col(textCol), n).as("_sh"))
      .withColumn("_n", size(col("_sh")).cast("long"))
      .filter(col("_n") > 0)
    val perDoc = base.select(col(idCol), col("_n"))
    // df=1 shingles have exactly one (id, sh) row, so min(id) is the
    // owning document; hot shingles die in the partial aggregate.
    val uniq = base
      .select(col(idCol), explode(col("_sh")).as("sh"))
      .groupBy("sh")
      .agg(count(lit(1)).as("df"), min(col(idCol)).as("_owner"))
      .filter(col("df") === 1)
      .groupBy(col("_owner").as(idCol))
      .agg(count(lit(1)).as("_nu"))
    perDoc.join(uniq, Seq(idCol), "left")
      .select(col(idCol), col("_n").as("n_shingles"),
        (col("_n") - coalesce(col("_nu"), lit(0L))).as("n_dup"),
        round((col("_n") - coalesce(col("_nu"), lit(0L))).cast("double")
          / col("_n").cast("double"), 6).as("dup_frac"))
  }

  /** DuckDB oracle twin of [[crossDocDupFraction]]. */
  def duckCrossDocDupFraction(tbl: String, textCol: String, idCol: String,
                              n: Int): String =
    s"""WITH s AS (SELECT $idCol, unnest(${Dedup.duckShingleFps(textCol, n)}) AS sh
       |           FROM (SELECT *, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl)),
       |d AS (SELECT sh, count(*) AS df FROM s GROUP BY 1)
       |SELECT s.$idCol, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |       round(CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 6) AS dup_frac
       |FROM s JOIN d USING (sh) GROUP BY s.$idCol""".stripMargin

  /** Per-source DISTINCT-N-GRAM diversity ratio (distinct-n — the
    * corpus-health twin of Self-BLEU used to monitor SYNTHETIC data:
    * model-generated corpora collapse to repeated phrasings long
    * before per-document stats notice, and the share of distinct
    * n-grams per source is the cheap canary). `ratio` → 1 means every
    * n-gram occurrence is fresh; low values mean phrase reuse.
    *
    * Scale shape: one explode → ONE (source, shingle-hash) distinct-
    * style aggregate (map-side combinable; hashes, not strings, cross
    * the wire) → source-sized outputs. No joins.
    * Output: (source, n_grams, n_distinct, ratio).
    */
  def distinctNgramRatio(docs: DataFrame, textCol: String, srcCol: String,
                         n: Int): DataFrame = {
    // RAW occurrence n-gram fingerprints, deliberately NOT
    // [[Dedup.shingleFps]] (which deduplicates per doc — right for
    // Jaccard sets, wrong for a diversity ratio whose denominator is
    // occurrences); docs shorter than n grams contribute nothing.
    // Native since r14 (NgramFingerprints): the prior HOF window
    // builder paid interpreted lambda eval per gram.
    val sh = Dedup.rebalance(docs)
      .select(col(srcCol).as("source"),
        explode(org.apache.spark.sql.graft.NgramFingerprints(
          col(textCol), n)).as("_h"))
    sh.groupBy(col("source"), col("_h")).agg(count(lit(1)).as("_c"))
      .groupBy(col("source"))
      .agg(sum(col("_c")).as("n_grams"), count(lit(1)).as("n_distinct"))
      .select(col("source"), col("n_grams"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_grams").cast("double"), 6)
          .as("ratio"))
  }

  /** DuckDB oracle twin of [[distinctNgramRatio]] — raw occurrence
    * grams, no per-doc dedup.
    */
  def duckDistinctNgramRatio(tbl: String, textCol: String, srcCol: String,
                             n: Int): String = {
    val gram = (1 to n).map(k => s"w[i + ${k - 1}]").mkString(" || ' ' || ")
    val rawGrams = s"CASE WHEN len(w) >= $n THEN " +
      s"[$gram for i in range(1, len(w) - $n + 2)] ELSE [] END"
    s"""WITH s AS (SELECT $srcCol AS source,
       |                  (${TextAnalysis.duckFingerprint("sh")}) AS h
       |           FROM (SELECT $srcCol, unnest($rawGrams) AS sh
       |                 FROM (SELECT *, ${TextAnalysis.duckTokensBind(textCol)} AS w
       |                       FROM $tbl)))
       |SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
       |       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
       |       round(CAST(count(DISTINCT h) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |         AS ratio
       |FROM s GROUP BY source""".stripMargin
  }
}
