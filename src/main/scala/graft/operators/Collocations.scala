package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Collocation (phrase) mining via pointwise mutual information — the
  * classic first step of building a phrase vocabulary from a corpus
  * (word2phrase, n-gram tokenizer seeding): score each adjacent word
  * pair by how much more often it occurs than its parts would predict,
  *
  *   pmi(w1, w2) = ln( p(w1,w2) / (p(w1)·p(w2)) )
  *               = ln( c12 · Nt² / (Nb · c1 · c2) )
  *
  * with c12 = bigram count, c1/c2 = unigram counts, Nb/Nt = total
  * bigram/token occurrences. High-PMI pairs ("new york") are phrases;
  * high-frequency low-PMI pairs ("of the") are chance neighbors.
  *
  * Scale shape: bigram extraction is a narrow explode; the count tables
  * are vocabulary-sized hash aggregates; the scoring joins touch only
  * the (min-count-pruned) bigram vocabulary, never the corpus again.
  * Totals ride along as a broadcast 1-row cross join.
  *
  * Engine parity: counts are integral, and the score is computed in
  * LOG-SPACE — `ln c12 + 2·ln Nt − ln Nb − ln c1 − ln c2` — so no
  * intermediate product can overflow BIGINT no matter the corpus size
  * (the naive `c12·Nt²` silently wraps once Nt ≳ 3×10⁹ tokens, i.e. a
  * few GB of text). Both engines evaluate the identical fixed `+`/`−`
  * chain over exactly-representable integer-valued doubles; `round(…, 6)`
  * seals the last ulp.
  */
object Collocations {

  /** Log-space PMI score from the five count columns — overflow-free at
    * any corpus size (see object doc). Kept as a named expression so the
    * overflow regime is unit-testable with synthetic counts.
    */
  def pmiExpr(c12: Column, c1: Column, c2: Column,
              nt: Column, nb: Column): Column =
    log(c12.cast("double")) + lit(2.0) * log(nt.cast("double")) -
      log(nb.cast("double")) - log(c1.cast("double")) - log(c2.cast("double"))

  /** Adjacent-pair PMI over the corpus, restricted to bigrams seen at
    * least `minCount` times (the standard support prune — rare pairs
    * have unstable PMI and explode the output).
    * Output: (w1, w2, c12, pmi).
    */
  def pmiPairs(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = Dedup.rebalance(docs)
      .select(TextAnalysis.tokens(col(textCol)).as("_w"))
    // Docs with <2 tokens contribute no bigrams (a descending `sequence`
    // would crash element_at — same guard as Perplexity.docScores) but
    // still count toward the unigram/total-token statistics.
    val bigrams = toks.filter(size(col("_w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_w) - 1), i -> struct(element_at(_w, i) AS w1, element_at(_w, i + 1) AS w2))"))
        .as("_b"))
      .select(col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    val unigrams = toks.select(explode(col("_w")).as("w"))
    val big = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = unigrams.groupBy("w").agg(count(lit(1)).as("c"))
    val totals = unigrams.select(count(lit(1)).as("nt"))
      .crossJoin(bigrams.select(count(lit(1)).as("nb")))
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("w1"), col("w2"), col("c12"),
        round(pmiExpr(col("c12"), col("c1"), col("c2"),
          col("nt"), col("nb")), 6).as("pmi"))
  }

  /** DuckDB oracle twin of [[pmiPairs]]. */
  def duckPmiPairs(tbl: String, textCol: String, minCount: Long): String =
    s"""WITH d AS (SELECT ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |tok AS (SELECT unnest(w) AS w FROM d),
       |bg AS (SELECT w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
       |       FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i)),
       |big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
       |        HAVING count(*) >= $minCount),
       |uni AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
       |tot AS (SELECT (SELECT count(*) FROM tok) AS nt,
       |               (SELECT count(*) FROM bg) AS nb)
       |SELECT b.w1, b.w2, b.c12,
       |       round(ln(CAST(b.c12 AS DOUBLE)) + 2.0 * ln(CAST(nt AS DOUBLE))
       |             - ln(CAST(nb AS DOUBLE)) - ln(CAST(u1.c AS DOUBLE))
       |             - ln(CAST(u2.c AS DOUBLE)), 6) AS pmi
       |FROM big b
       |JOIN uni u1 ON u1.w = b.w1
       |JOIN uni u2 ON u2.w = b.w2, tot""".stripMargin
}
