package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Corpus-level inverse-document-frequency scoring: per-document mean
  * IDF of its distinct terms — the "rare-word score" used to surface
  * high-information documents (and, inverted, boilerplate) when
  * curating pre-training data.
  *
  * Scale shape: explode distinct tokens (narrow) → ONE term-key
  * exchange for the document-frequency aggregate → term-key join back
  * (the df side arrives already partitioned by term from its agg, so
  * AQE plans one extra exchange at most) → per-doc aggregate. Term
  * cardinality (vocabulary) ≪ corpus size, so the df relation is the
  * small side at any scale.
  *
  * Float parity: a plain `avg(ln(N/df))` is partial-aggregation-order
  * dependent. Instead each doc's (term, df) pairs are SORTED by term
  * and the ln-sum is a left fold over that array — bit-identical in
  * any engine that folds left (DuckDB `list_reduce` over
  * `list(... ORDER BY term)`), with one final division and round(6).
  */
object Idf {

  /** Per-document mean-IDF score.
    * Output: (idCol, n_terms, idf_score).
    */
  def docScores(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = Dedup.rebalance(docs)
    val tok = base.select(col(idCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("term"))
    val dfT = tok.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = base.select(count(lit(1)).as("n_docs"))
    tok.join(dfT, "term")
      .crossJoin(broadcast(n))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms"),
        sort_array(collect_list(struct(col("term"), col("df"), col("n_docs"))))
          .as("_tf"))
      .select(
        col(idCol), col("n_terms"),
        round(
          aggregate(col("_tf"), lit(0.0),
            (acc, t) => acc + log(t.getField("n_docs").cast("double")
              / t.getField("df").cast("double")))
            / col("n_terms").cast("double"), 6).as("idf_score"))
  }

  /** DuckDB oracle for [[docScores]] — same sorted left fold. */
  def duckDocScores(tbl: String, textCol: String, idCol: String): String =
    s"""WITH d AS (SELECT *, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |tok AS (SELECT $idCol, unnest(list_distinct(w)) AS term FROM d),
       |dft AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM $tbl),
       |j AS (SELECT $idCol, term, df, n_docs FROM tok JOIN dft USING (term), n)
       |SELECT $idCol, count(*) AS n_terms,
       |       round(list_reduce(
       |           list_prepend(0.0, list(ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
       |                                  ORDER BY term)),
       |           (acc, x) -> acc + x) / CAST(count(*) AS DOUBLE), 6) AS idf_score
       |FROM j GROUP BY $idCol""".stripMargin
}
