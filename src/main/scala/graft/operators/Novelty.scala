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
  * Scale shape: one explode over distinct per-doc shingles, one
  * vocabulary-sized hash aggregate for shingle document frequencies,
  * one join back, one per-doc aggregate. No window, no sort, no driver
  * data; integral counts until the single output division.
  */
object Novelty {

  /** Per-document duplicated-shingle stats.
    * Output: (idCol, n_shingles, n_dup, dup_frac) — `dup_frac` is the
    * fraction of the doc's distinct n-grams seen in ≥ 1 other doc.
    */
  def crossDocDupFraction(docs: DataFrame, textCol: String, idCol: String,
                          n: Int): DataFrame = {
    // shingles() emits DISTINCT n-grams per doc, so df below counts
    // documents containing the shingle, not occurrences.
    val sh = Dedup.rebalance(docs)
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
      .select(col(idCol), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_shingles").cast("double"), 6)
          .as("dup_frac"))
  }

  /** DuckDB oracle twin of [[crossDocDupFraction]]. */
  def duckCrossDocDupFraction(tbl: String, textCol: String, idCol: String,
                              n: Int): String =
    s"""WITH s AS (SELECT $idCol, unnest(${Dedup.duckShingles(textCol, n)}) AS sh
       |           FROM (SELECT *, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl)),
       |d AS (SELECT sh, count(*) AS df FROM s GROUP BY 1)
       |SELECT s.$idCol, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |       round(CAST(sum(CASE WHEN d.df > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 6) AS dup_frac
       |FROM s JOIN d USING (sh) GROUP BY s.$idCol""".stripMargin
}
