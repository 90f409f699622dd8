package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with an evaluation/benchmark set (the GPT-3 appendix-C /
  * Llama playbook — exact n-gram collision against the eval corpus).
  *
  * Scale shape: the eval set is tiny relative to the training corpus
  * (benchmarks are MBs, corpora are TBs), so its distinct-gram set is
  * collected into a broadcast hash relation and the training side stays
  * a NARROW scan → explode → broadcast-hash semi-join → per-doc count.
  * No all-to-all shuffle touches the 100 TB side until the final
  * per-doc aggregate (hash partial agg on doc id, map-side combined).
  *
  * Since r14 the gram keys are [[Dedup.shingleFps]] fingerprints (8-byte
  * longs) rather than shingle strings: the broadcast relation, the probe
  * keys, and the explode payload all shrink ~10×, and the gram strings
  * are never materialized. The duck twins apply the identical hash
  * ([[Dedup.duckShingleFps]]), so the counts stay exact between engines
  * (shared collisions, ~1e3 grams vs a 1e9 space).
  */
object Decontaminate {

  /** Per-document overlap counts: one row per training document sharing
    * ≥ 1 distinct word n-gram with the eval set.
    *
    * @param evalPred predicate selecting the eval rows INSIDE `docs`
    *                 (a self-contained eval split; a separate eval
    *                 DataFrame works identically via union-tagging)
    * @return (idCol, n_overlap) — n_overlap = distinct shared n-grams
    */
  def overlap(docs: DataFrame, textCol: String, idCol: String,
              evalPred: Column, n: Int): DataFrame = {
    val sh = Dedup.rebalance(docs)
      .select(col(idCol), evalPred.as("_is_eval"),
        Dedup.shingleFps(col(textCol), n).as("_g"))
    val evalGrams = sh.filter(col("_is_eval"))
      .select(explode(col("_g")).as("gram")).distinct()
    val trainGrams = sh.filter(!col("_is_eval"))
      .select(col(idCol), explode(col("_g")).as("gram"))
    // Shingle sets are distinct per doc and the eval side is distinct,
    // so the join multiplicity is 1 and count(*) = distinct overlap.
    trainGrams.join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** DuckDB oracle for [[overlap]]: same shingle builder, same eval
    * predicate, rendered from the same constants.
    */
  def duckOverlap(tbl: String, textCol: String, idCol: String,
                  evalPredSql: String, n: Int): String =
    s"""WITH d AS (SELECT *, ${graft.functions.TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |sh AS (SELECT $idCol, ($evalPredSql) AS is_eval,
       |              ${Dedup.duckShingleFps(textCol, n)} AS g FROM d),
       |ev AS (SELECT DISTINCT unnest(g) AS gram FROM sh WHERE is_eval),
       |tr AS (SELECT $idCol, unnest(g) AS gram FROM sh WHERE NOT is_eval)
       |SELECT $idCol, count(*) AS n_overlap
       |FROM tr JOIN ev USING (gram) GROUP BY $idCol""".stripMargin

  /** PER-EVAL-ITEM containment decontamination — the fuzzy tier
    * between [[overlap]]'s whole-eval-set gram counting and
    * [[embeddingOverlap]]'s semantic match: for each (training doc,
    * eval ITEM) pair, the fraction of the eval item's distinct
    * n-grams the training doc contains. `containment ≥ threshold`
    * catches lightly-edited benchmark leakage (reworded stems,
    * renumbered answers) that the exact whole-item collision misses,
    * and names WHICH benchmark item leaked — the per-example
    * train-test-overlap report of the GPT-3 appendix-C playbook.
    *
    * Scale shape: identical to [[overlap]] — eval postings (item id,
    * gram) are benchmark-sized and broadcast; the corpus side is one
    * narrow explode probing the broadcast, then a per-(doc, item)
    * map-side-combinable count. Both shingle sets are distinct, so
    * join multiplicity is 1 and count(*) = |∩|.
    *
    * Output: (idCol, eval_id, n_shared, containment) for pairs at or
    * above the threshold.
    */
  def itemContainment(docs: DataFrame, textCol: String, idCol: String,
                      evalPred: Column, n: Int,
                      threshold: Double): DataFrame = {
    val sh = Dedup.rebalance(docs)
      .select(col(idCol), evalPred.as("_is_eval"),
        Dedup.shingleFps(col(textCol), n).as("_g"))
    val evalPosts = sh.filter(col("_is_eval"))
      .select(col(idCol).as("eval_id"), size(col("_g")).as("_ne"),
        explode(col("_g")).as("gram"))
    val trainGrams = sh.filter(!col("_is_eval"))
      .select(col(idCol), explode(col("_g")).as("gram"))
    trainGrams.join(broadcast(evalPosts), "gram")
      .groupBy(col(idCol), col("eval_id"), col("_ne"))
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("containment",
        round(col("n_shared").cast("double") / col("_ne").cast("double"), 6))
      .filter(col("containment") >= threshold)
      .select(col(idCol), col("eval_id"), col("n_shared"), col("containment"))
  }

  /** DuckDB oracle for [[itemContainment]] — same postings join. */
  def duckItemContainment(tbl: String, textCol: String, idCol: String,
                          evalPredSql: String, n: Int,
                          threshold: Double): String =
    s"""WITH d AS (SELECT *, ${graft.functions.TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |sh AS (SELECT $idCol, ($evalPredSql) AS is_eval,
       |              ${Dedup.duckShingleFps(textCol, n)} AS g FROM d),
       |ev AS (SELECT $idCol AS eval_id, len(g) AS ne, unnest(g) AS gram
       |       FROM sh WHERE is_eval),
       |tr AS (SELECT $idCol, unnest(g) AS gram FROM sh WHERE NOT is_eval),
       |c AS (SELECT $idCol, eval_id, ne, count(*) AS n_shared
       |      FROM tr JOIN ev USING (gram) GROUP BY 1, 2, 3)
       |SELECT $idCol, eval_id, n_shared,
       |       round(CAST(n_shared AS DOUBLE) / CAST(ne AS DOUBLE), 6) AS containment
       |FROM c
       |WHERE round(CAST(n_shared AS DOUBLE) / CAST(ne AS DOUBLE), 6) >= $threshold""".stripMargin

  /** SEMANTIC decontamination: flag training vectors whose cosine
    * similarity to ANY eval vector reaches `threshold` — the
    * embedding-space complement of [[overlap]] (paraphrased benchmark
    * leakage has zero n-gram collision but high cosine; the modern
    * decontamination playbook runs both).
    *
    * Same scale shape as [[overlap]] and the brute-force ANN scan: the
    * eval set is tiny → broadcast; the training side is one narrow
    * scan scored per partition (BroadcastNestedLoopJoin over
    * train × eval with a codegen'd dot), then a doc-keyed partial agg.
    * Nothing corpus-sized shuffles. Vectors are pre-normalized
    * (FIXTURES.md) so dot = cosine.
    *
    * @return (idCol, n_hits, max_sim) — eval matches at ≥ threshold and
    *         the max similarity (6 dp), one row per flagged train vector
    */
  def embeddingOverlap(vectors: DataFrame, vecCol: String, idCol: String,
                       evalPred: Column, threshold: Double): DataFrame = {
    val v = Dedup.rebalance(vectors)
      .select(col(idCol), evalPred.as("_is_eval"), col(vecCol).as("_v"))
    val evalSide = v.filter(col("_is_eval"))
      .select(col("_v").as("_ev"))
    v.filter(!col("_is_eval"))
      .crossJoin(broadcast(evalSide))
      .withColumn("_sim", Similarity.dot(col("_v"), col("_ev")))
      .filter(col("_sim") >= threshold)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), round(max(col("_sim")), 6).as("max_sim"))
  }

  /** DuckDB oracle for [[embeddingOverlap]] (list_dot_product is
    * bitwise-equal to the engine's dot fold — Similarity scaladoc).
    */
  def duckEmbeddingOverlap(tbl: String, vecCol: String, idCol: String,
                           evalPredSql: String, threshold: Double): String =
    s"""WITH v AS (SELECT $idCol, ($evalPredSql) AS is_eval,
       |                  CAST($vecCol AS DOUBLE[]) AS vv FROM $tbl),
       |s AS (SELECT t.$idCol, list_dot_product(t.vv, e.vv) AS sim
       |      FROM v t, v e WHERE NOT t.is_eval AND e.is_eval)
       |SELECT $idCol, count(*) AS n_hits, round(max(sim), 6) AS max_sim
       |FROM s WHERE sim >= $threshold GROUP BY $idCol""".stripMargin
}
