package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Per-document unigram (token) Shannon entropy — the information-density
  * quality signal pre-training curation uses to drop keyword-stuffed and
  * template pages (pathologically LOW entropy: few token types repeated)
  * and random-character noise (HIGH entropy with no frequent types), the
  * complement of [[graft.functions.QualityFilters]]'s Gopher repetition
  * ratios which only look at the top type.
  *
  *   H(doc) = ln n − (1/n) · Σ_t c_t · ln c_t      (nats)
  *
  * Scale shape: explode → per-(doc, term) count (map-side combinable) →
  * per-doc aggregate. Both exchanges are doc-keyed/narrow; nothing is
  * vocabulary-global, so the operator is embarrassingly shardable.
  *
  * Float parity: `Σ c ln c` is folded over the doc's (term, count)
  * pairs SORTED by term — bit-identical left folds in both engines (the
  * [[Idf]] convention) — followed by one division, one subtraction, and
  * `round(6)`.
  */
object Entropy {

  /** Per-document token entropy. Empty documents have no token rows and
    * are absent (entropy of an empty message is undefined).
    * Output: (idCol, n_tokens, entropy).
    */
  def docEntropy(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = Dedup.rebalance(docs)
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
    tok
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"),
        sort_array(collect_list(struct(col("term"), col("c")))).as("_tc"))
      .select(col(idCol), col("n_tokens"),
        round(
          log(col("n_tokens").cast("double")) -
            aggregate(col("_tc"), lit(0.0),
              (acc, t) => acc + t.getField("c").cast("double") *
                log(t.getField("c").cast("double")))
              / col("n_tokens").cast("double"), 6).as("entropy"))
  }

  /** DuckDB oracle twin of [[docEntropy]] — same sorted left fold. */
  def duckDocEntropy(tbl: String, textCol: String, idCol: String): String =
    s"""WITH d AS (SELECT $idCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |tok AS (SELECT $idCol, unnest(w) AS term FROM d),
       |tc AS (SELECT $idCol, term, count(*) AS c FROM tok GROUP BY 1, 2)
       |SELECT $idCol, CAST(sum(c) AS BIGINT) AS n_tokens,
       |       round(ln(CAST(sum(c) AS DOUBLE)) -
       |             list_reduce(
       |               list_prepend(0.0,
       |                 list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) ORDER BY term)),
       |               (acc, x) -> acc + x) / CAST(sum(c) AS DOUBLE), 6) AS entropy
       |FROM tc GROUP BY $idCol""".stripMargin
}
