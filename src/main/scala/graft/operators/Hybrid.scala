package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{ScoredId, TopK}

/** Hybrid lexical + semantic retrieval via Reciprocal Rank Fusion
  * (Cormack et al. 2009 — the standard score-free fusion used by every
  * two-tower + BM25 retrieval stack): rank documents independently by
  * BM25 and by embedding cosine, then fuse
  *
  *   rrf(d) = 1/(K + rank_lex(d)) + 1/(K + rank_sem(d))
  *
  * with K = 60, summing only over lists where `d` appears (the rank-
  * cutoff variant). Rank fusion beats score fusion here because BM25
  * and cosine live on incomparable scales; ranks are integers, which
  * also makes the gate float-drift-proof — the only doubles are two
  * integer reciprocals added in a fixed order.
  *
  * Scale shape: each side reduces to its TRUE global top-`kPerSide`
  * through the bounded-heap [[graft.functions.TopK]] aggregate (map-side
  * partial, the exchange carries k·partitions entries — never a global
  * sort of the corpus). Everything after operates on ≤ 2·kPerSide
  * candidate rows — metadata scale, where the final rank window is free.
  * BM25 itself is one scan + a 1-row broadcast ([[Bm25.score]]); the
  * cosine side is one broadcast query vector against a narrow scan.
  */
object Hybrid {

  val RrfK = 60

  /** True global (rank → id) of the top `k` rows of `(id, score)` by
    * (score DESC, id ASC), computed with the bounded-heap aggregate —
    * identical ranks to a global window, without shuffling the corpus.
    */
  private def topRanks(side: DataFrame, k: Int, rankCol: String): DataFrame = {
    val topk = udaf(new TopK(k), Encoders.product[ScoredId])
    side.agg(topk(col("id"), col("score")).as("_top"))
      .select(posexplode(col("_top")).as(Seq("_r", "_e")))
      .select(col("_e.id").as("id"), (col("_r") + 1).cast("long").as(rankCol))
  }

  /** Fuse two scored relations (`id`, `score`) into the RRF top `kOut`.
    * Output: (id, rank_lex, rank_sem, rrf) — absent-side ranks are null
    * and contribute nothing.
    */
  def rrfFuse(lex: DataFrame, sem: DataFrame, kPerSide: Int, kOut: Int): DataFrame = {
    require(kOut <= 2 * kPerSide, s"kOut $kOut exceeds the candidate pool 2*$kPerSide")
    val l = topRanks(lex, kPerSide, "rank_lex")
    val s = topRanks(sem, kPerSide, "rank_sem")
    val fused = l.join(s, Seq("id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RrfK) + col("rank_lex")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(RrfK) + col("rank_sem")), lit(0.0)), 6))
    // ≤ 2·kPerSide candidate rows — the window is over metadata scale.
    val w = Window.orderBy(col("rrf").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= kOut)
      .select(col("id"), col("rank"), col("rank_lex"), col("rank_sem"), col("rrf"))
  }

  /** The composed retrieval: BM25 over `docs` + cosine of `embs` against
    * the `queryVecId` embedding, fused. Doc ids and vector ids share the
    * fixture's id space (doc_id ↔ vec_id).
    */
  def rrfRetrieve(docs: DataFrame, embs: DataFrame, textCol: String,
                  docIdCol: String, vecCol: String, vecIdCol: String,
                  terms: Seq[String], queryVecId: Long,
                  kPerSide: Int, kOut: Int): DataFrame = {
    val lex = Bm25.score(docs, textCol, docIdCol, terms)
      .select(col(docIdCol).as("id"), col("bm25").as("score"))
    val qv = embs.filter(col(vecIdCol) === queryVecId)
      .select(col(vecCol).as("_qv"))
    val sem = embs.filter(col(vecIdCol) =!= queryVecId)
      .crossJoin(broadcast(qv))
      .select(col(vecIdCol).as("id"),
        Similarity.dot(col(vecCol), col("_qv")).as("score"))
    rrfFuse(lex, sem, kPerSide, kOut)
  }

  /** DuckDB oracle for [[rrfRetrieve]]: full-corpus window ranks filtered
    * to `kPerSide` (identical to the true-top-k ranks the bounded heap
    * produces), same fusion arithmetic.
    */
  def duckRrfRetrieve(docsTbl: String, embsTbl: String, textCol: String,
                      docIdCol: String, vecCol: String, vecIdCol: String,
                      terms: Seq[String], queryVecId: Long,
                      kPerSide: Int, kOut: Int): String =
    s"""WITH lexall AS (SELECT $docIdCol AS id, bm25 FROM (
       |  ${Bm25.duckScore(docsTbl, textCol, docIdCol, terms).replace("\n", "\n  ")}
       |)),
       |l AS (SELECT id, rank_lex FROM (
       |  SELECT id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, id ASC) AS rank_lex
       |  FROM lexall) WHERE rank_lex <= $kPerSide),
       |semall AS (SELECT e.$vecIdCol AS id,
       |    list_dot_product(CAST(e.$vecCol AS DOUBLE[]), CAST(q.$vecCol AS DOUBLE[])) AS cscore
       |  FROM $embsTbl e, (SELECT $vecCol FROM $embsTbl WHERE $vecIdCol = $queryVecId) q
       |  WHERE e.$vecIdCol <> $queryVecId),
       |s AS (SELECT id, rank_sem FROM (
       |  SELECT id, ROW_NUMBER() OVER (ORDER BY cscore DESC, id ASC) AS rank_sem
       |  FROM semall) WHERE rank_sem <= $kPerSide),
       |f AS (SELECT coalesce(l.id, s.id) AS id, l.rank_lex, s.rank_sem,
       |             round(coalesce(1.0 / ($RrfK + l.rank_lex), 0.0) +
       |                   coalesce(1.0 / ($RrfK + s.rank_sem), 0.0), 6) AS rrf
       |      FROM l FULL OUTER JOIN s ON l.id = s.id)
       |SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS BIGINT) AS rank,
       |       rank_lex, rank_sem, rrf
       |FROM f QUALIFY rank <= $kOut""".stripMargin
}
