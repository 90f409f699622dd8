package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** TF-IDF cosine document similarity via an inverted-index join — the
  * sparse-vector complement to the dense-embedding similarity in
  * [[Similarity]]: no embeddings needed, candidates meet only on shared
  * vocabulary.
  *
  * Scale shape: the classic three-exchange inverted-index plan —
  * (doc, term) tf aggregate → term-keyed document-frequency aggregate →
  * term-keyed self-join. The join is the quadratic risk, so the
  * vocabulary is PRUNED before it: terms in fewer than [[DfMin]] docs
  * cannot produce a pair, and terms in more than 1/[[DfCapInv]] of the
  * corpus are stopword-like (their posting lists are the skew: a term
  * in 10% of 100 TB would self-join 10^2% of the corpus). Both bounds
  * are part of the operator's semantics and the oracle applies them
  * identically. Posting-list pruning is how real sparse-similarity
  * systems (Lucene, BM25 top-k) bound the same join.
  *
  * Engine parity: weights are `tf · ln(N/df)`; every per-document and
  * per-pair double sum is a SORTED left fold (by term), so
  * partial-aggregation order cannot perturb low bits; `sqrt` is
  * IEEE-correctly-rounded in both engines; one `round(…, 6)` at the
  * end.
  */
object TfidfSim {

  /** A term must appear in ≥ DfMin docs to generate candidate pairs. */
  val DfMin = 2
  /** …and in ≤ N/DfCapInv docs (stopword/posting-list-skew cutoff). */
  val DfCapInv = 5

  /** Document pairs with TF-IDF cosine ≥ `minCos` over the pruned
    * vocabulary. Output: (id_a, id_b, cosine).
    */
  def pairs(docs: DataFrame, textCol: String, idCol: String,
            minCos: Double): DataFrame = {
    val base = Dedup.rebalance(docs)
    val tok = base
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfT = tok.groupBy("term").agg(count(lit(1)).as("df"))
    val n = base.select(count(lit(1)).as("n_docs"))
    val kept = tok.join(dfT, "term").crossJoin(broadcast(n))
      .filter(col("df") >= DfMin && col("df") * DfCapInv <= col("n_docs"))
      .withColumn("w", col("tf").cast("double")
        * log(col("n_docs").cast("double") / col("df").cast("double")))
    // Per-doc norm over the kept vocabulary: sorted fold of w². The
    // fold is the native OrderedStructFieldSum (r14) — identical
    // left-to-right IEEE additions as the HOF aggregate it replaced
    // (NativeExprSpec parity gate), no per-term interpreted lambda.
    def orderedSum(t: Column) =
      org.apache.spark.sql.graft.OrderedStructFieldSum(t, 1)
    val norms = kept.groupBy("id")
      .agg(sort_array(collect_list(struct(col("term"),
        (col("w") * col("w")).as("p")))).as("_t"))
      .select(col("id"), sqrt(orderedSum(col("_t"))).as("norm"))
    val pairsDot = kept.select(col("id").as("id_a"), col("term"), col("w").as("wa"))
      .join(kept.select(col("id").as("id_b"), col("term"), col("w").as("wb")), "term")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sort_array(collect_list(struct(col("term"),
        (col("wa") * col("wb")).as("p")))).as("_t"))
      .select(col("id_a"), col("id_b"), orderedSum(col("_t")).as("_dot"))
    pairsDot
      .join(norms.select(col("id").as("id_a"), col("norm").as("_na")), "id_a")
      .join(norms.select(col("id").as("id_b"), col("norm").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("_dot") / (col("_na") * col("_nb")), 6).as("cosine"))
      .filter(col("cosine") >= minCos)
  }

  /** DuckDB oracle twin of [[pairs]] — same pruning, same sorted folds. */
  def duckPairs(tbl: String, textCol: String, idCol: String,
                minCos: Double): String =
    s"""WITH d AS (SELECT $idCol AS id, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |tok AS (SELECT id, unnest(w) AS term FROM d),
       |tf AS (SELECT id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |n AS (SELECT count(*) AS n_docs FROM $tbl),
       |kept AS (
       |  SELECT id, term,
       |         CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS w
       |  FROM tf JOIN dft USING (term), n
       |  WHERE df >= $DfMin AND df * $DfCapInv <= n_docs),
       |norms AS (
       |  SELECT id, sqrt(list_reduce(list_prepend(0.0, list(w * w ORDER BY term)),
       |                              (acc, x) -> acc + x)) AS norm
       |  FROM kept GROUP BY id),
       |pd AS (
       |  SELECT a.id AS id_a, b.id AS id_b,
       |         list_reduce(list_prepend(0.0, list(a.w * b.w ORDER BY a.term)),
       |                     (acc, x) -> acc + x) AS dt
       |  FROM kept a JOIN kept b ON a.term = b.term AND a.id < b.id
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT pd.id_a, pd.id_b, round(dt / (na.norm * nb.norm), 6) AS cosine
       |  FROM pd JOIN norms na ON pd.id_a = na.id
       |          JOIN norms nb ON pd.id_b = nb.id)
       |WHERE cosine >= $minCos""".stripMargin
}
