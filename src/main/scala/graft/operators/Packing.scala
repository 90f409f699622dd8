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

  /** Overlapping passage chunking — the retrieval/embedding preparation
    * operator (RAG indexing, long-document embedding): each document is
    * cut into `windowTokens`-token passages starting every `stride`
    * tokens (stride < window ⇒ overlap), the last passage clamped at
    * the document end. A document shorter than one window yields one
    * passage; an empty document yields none.
    *
    * Scale shape: pure narrow work — one token-split binding, one
    * Generate (posexplode_OUTER + null filter, the [[DupSpan]] lesson:
    * plain posexplode re-inlines the split into a pushed size() filter),
    * and per-passage slicing of the already-bound array. No shuffle at
    * any size; passage count scales with token volume / stride.
    *
    * Output: (idCol, passage_id, start_token, n_tokens, passage).
    */
  def passages(docs: DataFrame, textCol: String, idCol: String,
               windowTokens: Int, stride: Int): DataFrame = {
    require(windowTokens > 0 && stride > 0,
      s"windowTokens and stride must be positive, got $windowTokens/$stride")
    val nTok = size(col("_w"))
    // ceil((nTok - window) / stride) + 1 passages; sequence(0, -1) would
    // generate DESCENDING, so the empty case short-circuits to [].
    val nPass = when(nTok === 0, lit(0)).otherwise(
      ceil(greatest(nTok - windowTokens, lit(0)).cast("double") / stride)
        .cast("int") + 1)
    val idx = when(nPass === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), nPass - 1))
    val slice0 = slice(col("_w"), col("_p") * stride + 1, lit(windowTokens))
    Dedup.rebalance(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("_w"))
      .select(col(idCol), col("_w"), posexplode_outer(idx).as(Seq("_pi", "_p")))
      .filter(col("_p").isNotNull)
      .select(col(idCol),
        col("_p").cast("long").as("passage_id"),
        (col("_p") * stride).cast("long").as("start_token"),
        size(slice0).cast("long").as("n_tokens"),
        concat_ws(" ", slice0).as("passage"))
  }

  /** DuckDB oracle for [[passages]] — same passage count, same 1-based
    * inclusive clamped list slices.
    */
  def duckPassages(tbl: String, textCol: String, idCol: String,
                   windowTokens: Int, stride: Int): String = {
    val wT = windowTokens
    val s = stride
    s"""WITH d AS (SELECT $idCol, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |n AS (SELECT $idCol, w,
       |             CASE WHEN len(w) = 0 THEN 0
       |                  ELSE CAST(ceil(greatest(len(w) - $wT, 0) / CAST($s AS DOUBLE)) AS INT) + 1
       |             END AS np
       |      FROM d),
       |e AS (SELECT $idCol, w, i AS p FROM n, unnest(range(0, np)) t(i))
       |SELECT $idCol,
       |       CAST(p AS BIGINT) AS passage_id,
       |       CAST(p * $s AS BIGINT) AS start_token,
       |       CAST(len(w[(p*$s+1):(p*$s+$wT)]) AS BIGINT) AS n_tokens,
       |       array_to_string(w[(p*$s+1):(p*$s+$wT)], ' ') AS passage
       |FROM e""".stripMargin
  }

  /** DOCUMENT-BOUNDARY bin packing (Next-Fit-Decreasing): pack whole
    * documents into fixed token-capacity bins without ever splitting a
    * document — the packing used when examples must stay intact
    * (SFT/eval batching, retrieval corpora), complementing [[assign]]'s
    * concat-and-chunk which cuts across boundaries. Docs sort by
    * (tokens DESC, id) within a shard and each opens a new bin exactly
    * when it does not fit the current one; a doc larger than the
    * capacity gets a bin of its own. NFD is the one classic packing
    * heuristic whose state is a pure left fold (current bin, remaining
    * room), which is what makes it expressible — and auditable — as a
    * deterministic per-shard array fold on ANY engine; first-fit's
    * open-bin list would need mutable search state.
    *
    * Scale shape: ONE shard-keyed exchange, then a per-shard sorted
    * fold — shards are the parallelism unit and each must fit an
    * executor (the same contract as [[Splits.epochShuffle]]'s
    * shard-local sorts); bins never cross shards, so the global result
    * is simply (shard, bin)-keyed. The shard here is a deterministic
    * function of the id so the oracle can re-derive it inline.
    *
    * Output: (idCol, shard, n_tokens, bin) — bin is 0-based within the
    * shard.
    */
  def binPack(docs: DataFrame, textCol: String, idCol: String,
              capacity: Long, nShards: Int): DataFrame = {
    val sorted = docs
      .select(col(idCol), pmod(col(idCol), lit(nShards.toLong)).as("shard"),
        TextAnalysis.tokenCount(col(textCol)).as("n_tokens"))
      .groupBy(col("shard"))
      .agg(sort_array(collect_list(
        struct((-col("n_tokens")).as("_neg"), col(idCol).as("_id"),
          col("n_tokens").as("_nt")))).as("_docs"))
    // left fold carrying (current bin, remaining room) and appending
    // each doc's bin assignment; zip back to the sorted docs
    // rem = −1 so the FIRST doc (even a 0-token one) never "fits" and
    // always opens bin 0, matching the oracle's rk=1 anchor row
    val init = struct(lit(-1).as("cur"), lit(-1L).as("rem"),
      array().cast("array<int>").as("bins"))
    val folded = sorted.withColumn("_st",
      aggregate(col("_docs"), init, (s, d) => {
        val fits = d.getField("_nt") <= s.getField("rem")
        val nb = when(fits, s.getField("cur")).otherwise(s.getField("cur") + 1)
        struct(nb.as("cur"),
          when(fits, s.getField("rem") - d.getField("_nt"))
            .otherwise(lit(capacity) - d.getField("_nt")).as("rem"),
          concat(s.getField("bins"), array(nb)).as("bins"))
      }))
    folded
      .select(col("shard"),
        explode(arrays_zip(col("_docs"), col("_st.bins"))).as("_z"))
      .select(col("_z._docs._id").as(idCol), col("shard"),
        col("_z._docs._nt").as("n_tokens"), col("_z.bins").as("bin"))
  }

  /** DuckDB oracle for [[binPack]]: the fold restated as a recursive
    * CTE walking each shard's (tokens DESC, id) rank order.
    */
  def duckBinPack(tbl: String, textCol: String, idCol: String,
                  capacity: Long, nShards: Int): String =
    s"""WITH RECURSIVE d AS (
       |  SELECT $idCol, (($idCol % $nShards) + $nShards) % $nShards AS shard,
       |         CAST(len(${TextAnalysis.duckTokensBind(textCol)}) AS BIGINT) AS n_tokens
       |  FROM $tbl),
       |r AS (SELECT *, row_number() OVER (PARTITION BY shard
       |        ORDER BY n_tokens DESC, $idCol ASC) AS rk FROM d),
       |f AS (
       |  SELECT shard, rk, $idCol, n_tokens, 0 AS bin,
       |         $capacity - n_tokens AS rem
       |  FROM r WHERE rk = 1
       |  UNION ALL
       |  SELECT r.shard, r.rk, r.$idCol, r.n_tokens,
       |         CASE WHEN r.n_tokens <= f.rem THEN f.bin ELSE f.bin + 1 END,
       |         CASE WHEN r.n_tokens <= f.rem THEN f.rem - r.n_tokens
       |              ELSE $capacity - r.n_tokens END
       |  FROM f JOIN r ON r.shard = f.shard AND r.rk = f.rk + 1)
       |SELECT $idCol, shard, n_tokens, bin FROM f""".stripMargin
}
