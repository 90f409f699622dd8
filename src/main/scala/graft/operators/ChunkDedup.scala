package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Sub-document exact deduplication: split each document into fixed-size
  * token chunks and remove chunks whose text already occurred in a
  * lower-id document (the C4 / RefinedWeb "line dedup" operator,
  * generalized to token windows because the synthetic corpus has no
  * newlines). A cleaned document is the concatenation of its kept
  * chunks in position order.
  *
  * Scale shape: chunking is a narrow projection (tokens → slice →
  * string); the ONLY all-to-all is one hash exchange on the chunk text,
  * under which a window `min(docId)` marks each chunk's keeper — a
  * single shuffle whose key cardinality is the distinct-chunk count, no
  * sort beyond the window's local one, then a map-side-combined per-doc
  * aggregate. The groupBy+self-join alternative would shuffle the chunk
  * relation twice; the window form shuffles it once.
  */
object ChunkDedup {

  /** Per-document chunk-dedup stats: total chunks, kept chunks (first
    * global occurrence by min doc id — duplicate chunks WITHIN the
    * keeper doc are all "kept": they tie on the min), and the ratio.
    *
    * Output: (idCol, n_chunks, n_kept, kept_ratio).
    */
  def stats(docs: DataFrame, textCol: String, idCol: String,
            chunkTokens: Int): DataFrame = {
    val sz = chunkTokens
    val w = TextAnalysis.tokens(col(textCol))
    val nChunks = ceil(size(col("_w")).cast("double") / sz).cast("int")
    // Guard: sequence(0, -1) on an empty doc would generate a
    // DESCENDING range — empty docs short-circuit to zero chunks.
    val chunks = when(size(col("_w")) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(col("_w"), i * sz + 1, lit(sz)))))
    val exploded = Dedup.rebalance(docs)
      .withColumn("_w", w)
      .select(col(idCol), posexplode(chunks).as(Seq("_pos", "_chunk")))
    val byChunk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_chunk"))
    exploded
      .withColumn("_keeper", min(col(idCol)).over(byChunk))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col(idCol) === col("_keeper"), 1L).otherwise(0L)).as("n_kept"))
      .withColumn("kept_ratio",
        round(col("n_kept").cast("double") / col("n_chunks").cast("double"), 6))
  }

  /** DuckDB oracle for [[stats]] — same chunking (1-indexed inclusive
    * list slice ≡ Spark `slice`), same keeper rule.
    */
  def duckStats(tbl: String, textCol: String, idCol: String,
                chunkTokens: Int): String = {
    val sz = chunkTokens
    s"""WITH d AS (SELECT *, ${TextAnalysis.duckTokensBind(textCol)} AS w FROM $tbl),
       |ch AS (SELECT $idCol, i AS pos,
       |              array_to_string(w[(i*$sz+1):(i*$sz+$sz)], ' ') AS chunk
       |       FROM d, unnest(range(0, CAST(ceil(len(w)/CAST($sz AS DOUBLE)) AS INT))) AS t(i)),
       |k AS (SELECT *, min($idCol) OVER (PARTITION BY chunk) AS keeper FROM ch)
       |SELECT $idCol,
       |       count(*) AS n_chunks,
       |       CAST(sum(CASE WHEN $idCol = keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       round(CAST(sum(CASE WHEN $idCol = keeper THEN 1 ELSE 0 END) AS DOUBLE)
       |             / CAST(count(*) AS DOUBLE), 6) AS kept_ratio
       |FROM k GROUP BY $idCol""".stripMargin
  }
}
