package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** The composed training-data preparation pipeline — the end-to-end flow a
  * user would actually run over a raw 100 TB document corpus:
  *
  *   1. score: language-ID + quality + token count (narrow projection);
  *   2. filter: keep the target language above a quality floor
  *      (predicates evaluate next to the scan — no shuffle yet);
  *   3. exact dedup: one hash partial-agg on md5(text)
  *      ([[Dedup.exact]]);
  *   4. near-dup dedup: MinHash+LSH candidate pairs
  *      ([[Dedup.minhashLshPairs]], banded equi-join — never all-pairs)
  *      resolved to clusters ([[Dedup.resolvePairs]],
  *      large-star/small-star, O(log n) rounds), keeping each cluster's
  *      min-id representative.
  *
  * Output is the training manifest: surviving doc ids with their language,
  * quality, and token-count metadata. Every stage is an operator gated
  * elsewhere on its own; this composition is itself oracle-checked
  * end-to-end (the DuckDB twin mirrors stages 1–3 directly and replaces
  * the LSH pair search with the exact pairwise ground truth, so the gate
  * re-proves 100% LSH recall *through the whole pipeline*).
  */
object Pipeline {

  /** See object doc. `docs` is the raw corpus; the result keeps one row
    * per surviving document with columns `(idCol, lang_pred, quality,
    * n_tokens)`.
    */
  def prepCorpus(docs: DataFrame, textCol: String, idCol: String,
                 lang: String, minQuality: Double,
                 n: Int = 3, bands: Int = 42, rowsPerBand: Int = 3,
                 threshold: Double = 0.5): DataFrame = {
    val scored = Dedup.rebalance(docs)
      .withColumn("_w", TextAnalysis.tokens(col(textCol))) // bind the split once
      .withColumn("lang_pred", TextAnalysis.langIdOf(col("_w")))
      .withColumn("quality", TextAnalysis.qualityScoreOf(col(textCol), col("_w")))
      .withColumn("n_tokens", TextAnalysis.tokenCountOf(col("_w")))
      .filter(col("lang_pred") === lang && col("quality") >= minQuality)
      .drop("_w")
    val exact = Dedup.exact(scored, textCol, idCol)
    val pairs = Dedup.minhashLshPairs(exact, textCol, idCol,
      n, bands, rowsPerBand, threshold)
    Dedup.resolvePairs(exact, pairs, idCol)
      .select(col(idCol), col("lang_pred"), col("quality"), col("n_tokens"))
  }

  /** DuckDB oracle for [[prepCorpus]]: stages 1–3 mirrored directly, the
    * LSH pair search replaced by the exact pairwise ground truth
    * ([[Dedup.duckPairCtes]]), clusters closed by a recursive CTE.
    */
  def duckPrepCorpus(tbl: String, textCol: String, idCol: String,
                     lang: String, minQuality: Double,
                     n: Int, threshold: Double): String =
    s"""WITH scored AS (
       |  SELECT $idCol, $textCol,
       |         ${TextAnalysis.duckLangId} AS lang_pred,
       |         ${TextAnalysis.duckQualityScore(textCol)} AS quality,
       |         ${TextAnalysis.duckTokenCount} AS n_tokens
       |  FROM (SELECT *, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl) d),
       |filt AS (
       |  SELECT * FROM scored WHERE lang_pred = '$lang' AND quality >= $minQuality),
       |ded AS (
       |  SELECT * FROM filt
       |  WHERE $idCol IN (SELECT min($idCol) FROM filt GROUP BY $textCol)),
       |${Dedup.duckPairCtes("ded", textCol, idCol, n, "TRUE")},
       |np AS (SELECT id_a, id_b FROM p WHERE jaccard >= $threshold),
       |e AS (SELECT id_a AS src, id_b AS dst FROM np
       |      UNION SELECT id_b, id_a FROM np),
       |cc AS (
       |  WITH RECURSIVE reach(id, lbl) AS (
       |    SELECT src, src FROM e
       |    UNION
       |    SELECT e.src, reach.lbl FROM e JOIN reach ON e.dst = reach.id)
       |  SELECT id, min(lbl) AS lbl FROM reach GROUP BY id)
       |SELECT $idCol, lang_pred, quality, n_tokens FROM ded
       |WHERE $idCol NOT IN (SELECT id FROM cc WHERE id <> lbl)""".stripMargin
}
