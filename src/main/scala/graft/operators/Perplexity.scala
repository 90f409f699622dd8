package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Bigram language-model scoring for quality filtering — the CCNet /
  * Wikipedia-LM recipe: score each document by the mean negative
  * log-probability of its bigrams under a count-based LM with add-one
  * smoothing, then drop the high-perplexity (gibberish, boilerplate,
  * OCR-noise) tail. Here the LM is trained on the corpus itself
  * (self-scoring) — at production scale the count tables come from a
  * reference corpus and are identical machinery.
  *
  * p(w2 | w1) = (c(w1 w2) + 1) / (c(w1) + V),  V = |vocab|
  *
  * Scale shape: bigram extraction is a narrow explode; the count
  * tables are two hash aggregates keyed by bigram/unigram (vocabulary-
  * sized, ≪ corpus); scoring joins the exploded bigrams back on those
  * keys and folds per document. No global sort, no driver data.
  *
  * Engine parity: counts are integral; each bigram's ln-probability is
  * computed once and the per-doc sum is a SORTED left fold (by bigram),
  * so partial-agg order cannot perturb low bits; one `round(…, 6)`.
  */
object Perplexity {

  /** Per-document mean negative log-probability (lower = more fluent
    * under the corpus LM). Documents with fewer than 2 tokens have no
    * bigrams and are excluded (no LM evidence either way).
    * Output: (idCol, n_bigrams, nll).
    */
  def docScores(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val base = Dedup.rebalance(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_w"))
    // Docs with <2 tokens have no bigrams: `sequence(1, size-1)` would run
    // DESCENDING (stop < start) and hit element_at index 0. Filter them out
    // of bigram extraction only — unigram/vocab counts still see every doc,
    // matching the oracle, whose `range(1, len(w))` is simply empty.
    val bigrams = base
      .filter(size(col("_w")) >= 2)
      .select(col(idCol),
        explode(expr(
          "transform(sequence(1, size(_w) - 1), i -> struct(element_at(_w, i) AS w1, element_at(_w, i + 1) AS w2))"))
          .as("_b"))
      .select(col(idCol), col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val uni = base
      .select(col(idCol), explode(col("_w")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = uni.select(count(lit(1)).as("v"))
    bigrams
      .join(big, Seq("w1", "w2"))
      .join(uni, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("_lnp",
        log((col("c12") + 1).cast("double") / (col("c1") + col("v")).cast("double")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sort_array(collect_list(struct(col("w1"), col("w2"), col("_lnp"))))
          .as("_t"))
      .select(col(idCol), col("n_bigrams"),
        // Native ordered fold (r14): bitwise-equal to the HOF aggregate.
        round(-org.apache.spark.sql.graft.OrderedStructFieldSum(col("_t"), 2)
          / col("n_bigrams").cast("double"), 6).as("nll"))
  }

  /** DuckDB oracle twin of [[docScores]] — same smoothing, same sorted
    * fold.
    */
  def duckDocScores(tbl: String, textCol: String, idCol: String): String =
    s"""WITH d AS (SELECT $idCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |bg AS (SELECT $idCol, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
       |       FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i)),
       |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |uni AS (SELECT w1, count(*) AS c1
       |        FROM (SELECT unnest(w) AS w1 FROM d) GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM uni),
       |s AS (SELECT bg.$idCol, bg.w1, bg.w2,
       |             ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)) AS lnp
       |      FROM bg JOIN big USING (w1, w2) JOIN uni USING (w1), v)
       |SELECT $idCol, count(*) AS n_bigrams,
       |       round(-list_reduce(list_prepend(0.0, list(lnp ORDER BY w1, w2, lnp)),
       |                          (acc, x) -> acc + x)
       |             / CAST(count(*) AS DOUBLE), 6) AS nll
       |FROM s GROUP BY $idCol""".stripMargin
}
