package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Sequence packing for LLM pre-training: documents are concatenated in
  * a deterministic order and cut into fixed-length context windows
  * ("concat-and-chunk", the packing used by GPT/Llama-style training
  * loaders). Each document is assigned the window its first token lands
  * in, its offset inside that window, and the number of windows it
  * spans.
  *
  * Scale shape: packing is per-GROUP (here: per source) — a single hash
  * exchange on the group key, then one window cumulative sum ordered by
  * the id. A GLOBAL packing order would need a total sort of the 100 TB
  * corpus; per-source packing shuffles once on a low-cardinality key
  * and each training shard stays an independent token stream, which is
  * what loaders want anyway. All arithmetic is integral (token counts,
  * offsets), so the oracle parity is exact.
  */
object Packing {

  /** Per-document packing assignment.
    * Output: (idCol, groupCol, n_tokens, pack_id, pack_offset, n_spans)
    * where pack_id is the 0-based window index WITHIN the group,
    * pack_offset the token offset of the doc's first token inside that
    * window, and n_spans how many windows the doc touches (empty docs
    * span 1 by convention: they sit at a boundary, consuming nothing).
    */
  def assign(docs: DataFrame, textCol: String, idCol: String,
             groupCol: String, ctxLen: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val nTok = TextAnalysis.tokenCount(col(textCol))
    docs
      .select(col(idCol), col(groupCol), nTok.as("n_tokens"))
      .withColumn("_start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol), col(groupCol), col("n_tokens"),
        floor(col("_start") / ctxLen.toDouble).cast("long").as("pack_id"),
        pmod(col("_start"), lit(ctxLen.toLong)).as("pack_offset"),
        (floor((col("_start") + greatest(col("n_tokens"), lit(1L)) - 1L)
          / ctxLen.toDouble).cast("long")
          - floor(col("_start") / ctxLen.toDouble).cast("long") + 1L)
          .as("n_spans"))
  }

  /** DuckDB oracle for [[assign]] — identical window frame and integer
    * arithmetic.
    */
  def duckAssign(tbl: String, textCol: String, idCol: String,
                 groupCol: String, ctxLen: Int): String =
    s"""WITH d AS (SELECT $idCol, $groupCol,
       |                  CAST(len(${TextAnalysis.duckTokensBind(textCol)}) AS BIGINT) AS n_tokens
       |           FROM $tbl),
       |c AS (SELECT *, COALESCE(sum(n_tokens) OVER (
       |          PARTITION BY $groupCol ORDER BY $idCol
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
       |      FROM d)
       |SELECT $idCol, $groupCol, n_tokens,
       |       CAST(floor(s / CAST($ctxLen AS DOUBLE)) AS BIGINT) AS pack_id,
       |       CAST(s % $ctxLen AS BIGINT) AS pack_offset,
       |       CAST(floor((s + greatest(n_tokens, 1) - 1) / CAST($ctxLen AS DOUBLE)) AS BIGINT)
       |         - CAST(floor(s / CAST($ctxLen AS DOUBLE)) AS BIGINT) + 1 AS n_spans
       |FROM c""".stripMargin
}
