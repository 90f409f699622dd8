package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Content-defined chunking (Rabin-boundary CDC, the storage-dedup
  * classic): chunk boundaries fall where the rolling hash of the last
  * `w` characters is ≡ 0 (mod `divisor`), so boundary positions are a
  * function of local CONTENT, not absolute offsets — inserting a byte
  * near the start of a document shifts every fixed-window chunk but
  * realigns content-defined chunks after the first boundary
  * (spec-pinned). That shift-resilience is why CDC, not fixed windows,
  * is how near-identical crawl snapshots dedup at the storage layer;
  * average chunk length ≈ `divisor` characters.
  *
  * The window hash is [[TextAnalysis.fingerprint]] of the w-char
  * substring — the rolling-hash primitive whose cross-engine parity is
  * already gated — and chunk identity is `md5(chunk)`.
  *
  * Scale shape: boundary detection and chunk extraction are narrow
  * per-row HOF work (O(n·w) per document, linear in the corpus, no
  * shuffle); the dup statistics cost ONE chunk-key exchange (distinct
  * doc count per fingerprint) plus the join back — the [[ChunkDedup]]
  * posture with content-defined instead of token-window chunks.
  *
  * Output: (idCol, n_chunks, n_dup_chunks, dup_fraction) — dup = the
  * chunk's fingerprint appears in ≥ 2 distinct documents.
  */
object ContentChunks {

  /** Boundary positions (1-based, ascending, always ending at n) for a
    * text column — exposed for the spec's shift-resilience check.
    */
  def boundariesOf(text: Column, w: Int, divisor: Int): Column = {
    val n = length(text)
    // Native windowed scan since r13 (CdcBoundaries): the prior HOF
    // (`filter(sequence(w,n), i → fingerprint(substr…) % divisor = 0)`)
    // paid interpreted lambda eval per window PER CHARACTER — the
    // dominant cost of q_content_chunks and the operator hit hardest
    // by the sticky-JIT failure mode (BASELINE.md r13). Bit-identical
    // boundary positions (NativeExprSpec parity, oracle unchanged).
    val bp = org.apache.spark.sql.graft.CdcBoundaries(text, w, divisor.toLong)
    // close the final chunk at n unless n is already a boundary (the
    // prepended-0 guard keeps element_at total on empty bp)
    when(element_at(concat(array(lit(0)), bp), -1) === n, bp)
      .otherwise(concat(bp, array(n)))
  }

  /** The chunks themselves: (idCol, chunk) exploded. */
  def chunksOf(docs: DataFrame, textCol: String, idCol: String,
               w: Int, divisor: Int): DataFrame = {
    val text = col(textCol)
    val withB = Dedup.rebalance(docs)
      .filter(length(text) > 0)
      .select(col(idCol), text.as("_t"),
        boundariesOf(text, w, divisor).as("_bp"))
      .withColumn("_pb", concat(array(lit(0)), col("_bp")))
    withB.select(col(idCol),
      explode(transform(sequence(lit(1), size(col("_bp"))), k =>
        col("_t").substr(element_at(col("_pb"), k) + 1,
          element_at(col("_bp"), k) - element_at(col("_pb"), k))))
        .as("chunk"))
  }

  def stats(docs: DataFrame, textCol: String, idCol: String,
            w: Int, divisor: Int): DataFrame = {
    val chunks = chunksOf(docs, textCol, idCol, w, divisor)
      .select(col(idCol), md5(col("chunk")).as("_fp"))
    val dfTable = chunks.select(col(idCol), col("_fp")).distinct()
      .groupBy(col("_fp")).agg(count(lit(1)).as("_nd"))
    chunks.join(dfTable, "_fp")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_nd") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"))
      .select(col(idCol), col("n_chunks"), col("n_dup_chunks"),
        round(col("n_dup_chunks").cast("double") /
          col("n_chunks").cast("double"), 6).as("dup_fraction"))
  }

  /** DuckDB oracle twin of [[stats]] — identical rolling-hash windows,
    * boundary rule, chunk spans, and dup accounting.
    */
  def duckStats(tbl: String, textCol: String, idCol: String,
                w: Int, divisor: Int): String = {
    val winHash = TextAnalysis.duckFingerprint(s"$textCol[i-${w - 1}:i]")
    s"""WITH b AS (
       |  SELECT $idCol, $textCol, length($textCol) AS n,
       |         list_filter(range($w, length($textCol) + 1),
       |                     i -> ($winHash) % $divisor = 0) AS bp
       |  FROM $tbl WHERE length($textCol) > 0),
       |b2 AS (
       |  SELECT $idCol, $textCol,
       |         CASE WHEN len(bp) > 0 AND bp[-1] = n THEN bp
       |              ELSE list_append(bp, n) END AS bp2
       |  FROM b),
       |ch0 AS (
       |  SELECT $idCol, $textCol, list_prepend(0, bp2) AS pb, bp2,
       |         unnest(range(1, len(bp2) + 1)) AS k
       |  FROM b2),
       |ch AS (SELECT $idCol, md5($textCol[pb[k] + 1 : bp2[k]]) AS fp FROM ch0),
       |df AS (SELECT fp, count(*) AS nd
       |       FROM (SELECT DISTINCT $idCol, fp FROM ch) GROUP BY fp),
       |agg AS (
       |  SELECT $idCol, CAST(count(*) AS BIGINT) AS n_chunks,
       |         CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks
       |  FROM ch JOIN df USING (fp) GROUP BY $idCol)
       |SELECT $idCol, n_chunks, n_dup_chunks,
       |       round(CAST(n_dup_chunks AS DOUBLE) / CAST(n_chunks AS DOUBLE), 6)
       |         AS dup_fraction
       |FROM agg""".stripMargin
  }
}
