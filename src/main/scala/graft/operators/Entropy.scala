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

  /** Jensen–Shannon divergence between TWO corpus slices' unigram
    * distributions — the symmetric, bounded (∈ [0, ln 2]) "how
    * different do these two sources talk" measure the asymmetric KL
    * drift monitors can't give (KL explodes on any token one side
    * lacks; JSD's mixture midpoint absorbs it):
    *
    *   JSD(p‖q) = ½·Σ_t [ p_t·ln(2p_t/(p_t+q_t)) + q_t·ln(2q_t/(p_t+q_t)) ]
    *
    * with zero-count terms contributing exactly their finite side.
    * The ratio 2p/(p+q) is computed from COUNT CROSS-PRODUCTS
    * (2·c_a·n_b / (c_a·n_b + c_b·n_a)) — exact integers into one ln —
    * and each token's term µ-requantizes before the cross-vocabulary
    * sum (the order-independence discipline).
    *
    * Scale shape: one token-keyed exchange to (token, c_a, c_b)
    * (vocab-sized, map-side combinable), then vocab-table arithmetic.
    *
    * Output (one row): (n_tokens_a, n_tokens_b, vocab, jsd,
    * jsd_normalized = jsd/ln 2 ∈ [0,1]) — NULL when either side is
    * empty.
    */
  def jsDivergence(docs: DataFrame, textCol: String, predA: String,
                   predB: String): DataFrame = {
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val tok = Dedup.rebalance(docs)
      .filter(expr(predA) || expr(predB))
      .select(expr(predA).as("_a"),
        explode(TextAnalysis.tokens(col(textCol))).as("_t"))
    val byTok = tok.groupBy(col("_t")).agg(
      count(when(col("_a"), lit(1))).as("_ca"),
      count(when(!col("_a"), lit(1))).as("_cb"))
    val whole = org.apache.spark.sql.expressions.Window.partitionBy()
    val cum = byTok
      .withColumn("_na", sum(col("_ca")).over(whole))
      .withColumn("_nb", sum(col("_cb")).over(whole))
    val pxq = (d38(col("_ca")) * d38(col("_nb"))
      + d38(col("_cb")) * d38(col("_na")))
    // pxq = 0 only when the OTHER side is empty (n = 0) — the output is
    // NULL then anyway, but ANSI mode insists the division never runs.
    val termA = when(col("_ca") > 0 && pxq > 0,
      d(col("_ca")) / d(col("_na"))
        * log(d(lit(2) * d38(col("_ca")) * d38(col("_nb"))) / d(pxq)))
      .otherwise(lit(0.0))
    val termB = when(col("_cb") > 0 && pxq > 0,
      d(col("_cb")) / d(col("_nb"))
        * log(d(lit(2) * d38(col("_cb")) * d38(col("_na"))) / d(pxq)))
      .otherwise(lit(0.0))
    cum
      .select(col("_na"), col("_nb"),
        round((termA + termB) * lit(1.0e9)).cast("long").as("_tm"))
      .groupBy(col("_na"), col("_nb"))
      .agg(count(lit(1)).as("vocab"), sum(col("_tm")).as("_jm"))
      .select(col("_na").as("n_tokens_a"), col("_nb").as("n_tokens_b"),
        col("vocab"),
        when(col("_na") > 0 && col("_nb") > 0,
          round(d(col("_jm")) / lit(2.0e9), 6)).as("jsd"),
        when(col("_na") > 0 && col("_nb") > 0,
          round(d(col("_jm")) / lit(2.0e9) / lit(math.log(2.0)), 6))
          .as("jsd_normalized"))
  }

  /** DuckDB oracle twin of [[jsDivergence]]. */
  def duckJsDivergence(tbl: String, textCol: String, predA: String,
                       predB: String): String =
    s"""WITH d AS (SELECT ($predA) AS a,
       |                  ${TextAnalysis.duckTokensBind(textCol)} AS w
       |           FROM $tbl WHERE ($predA) OR ($predB)),
       |tc AS (SELECT t,
       |              CAST(count(*) FILTER (WHERE a) AS BIGINT) AS ca,
       |              CAST(count(*) FILTER (WHERE NOT a) AS BIGINT) AS cb
       |       FROM (SELECT a, unnest(w) AS t FROM d) GROUP BY 1),
       |cum AS (SELECT *, sum(ca) OVER () AS na, sum(cb) OVER () AS nb
       |        FROM tc),
       |terms AS (
       |  SELECT na, nb,
       |    CAST(round((
       |      CASE WHEN ca > 0 THEN
       |        CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)
       |        * ln(CAST(2 * CAST(ca AS HUGEINT) * CAST(nb AS HUGEINT)
       |                  AS DOUBLE)
       |             / CAST(CAST(ca AS HUGEINT) * CAST(nb AS HUGEINT)
       |                    + CAST(cb AS HUGEINT) * CAST(na AS HUGEINT)
       |                    AS DOUBLE))
       |      ELSE 0.0 END
       |      + CASE WHEN cb > 0 THEN
       |          CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)
       |          * ln(CAST(2 * CAST(cb AS HUGEINT) * CAST(na AS HUGEINT)
       |                    AS DOUBLE)
       |               / CAST(CAST(ca AS HUGEINT) * CAST(nb AS HUGEINT)
       |                      + CAST(cb AS HUGEINT) * CAST(na AS HUGEINT)
       |                      AS DOUBLE))
       |        ELSE 0.0 END) * 1.0e9) AS BIGINT) AS tm
       |  FROM cum),
       |agg AS (
       |  SELECT CAST(max(na) AS BIGINT) AS n_tokens_a,
       |         CAST(max(nb) AS BIGINT) AS n_tokens_b,
       |         CAST(count(*) AS BIGINT) AS vocab,
       |         CAST(sum(tm) AS BIGINT) AS jm
       |  FROM terms)
       |SELECT n_tokens_a, n_tokens_b, vocab,
       |       CASE WHEN n_tokens_a > 0 AND n_tokens_b > 0 THEN
       |         round(CAST(jm AS DOUBLE) / 2.0e9, 6) END AS jsd,
       |       CASE WHEN n_tokens_a > 0 AND n_tokens_b > 0 THEN
       |         round(CAST(jm AS DOUBLE) / 2.0e9 / ${math.log(2.0)}, 6)
       |       END AS jsd_normalized
       |FROM agg""".stripMargin
}
