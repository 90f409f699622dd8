package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al., "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023): k-means-partition the embedding space, search
  * for cosine near-duplicate pairs ONLY within each cluster, and keep
  * one representative per connected near-dup group. Catches paraphrases
  * and re-renderings that shingle-based dedup (MinHash/SimHash) misses
  * because the surface text differs.
  *
  * Scale shape: the cluster assignment is a narrow broadcast-centroid
  * argmax ([[Similarity.kmeansCells]] — no corpus shuffle); the pair
  * search is an equi-join on the cell key, so the quadratic blow-up is
  * bounded per cell, with [[Dedup.capBuckets]] as the same skew guard
  * the LSH paths use (oversized cells are dropped and counted, not
  * allowed to go quadratic on one task — at web scale you raise k so
  * cells stay small, exactly as the paper does with 25k clusters);
  * resolution is the paper's GREEDY keep-lowest-index policy — a row is
  * dropped iff some SMALLER-id row in its cell is within the threshold
  * — which is one distinct + one anti-join, no iterative closure. (The
  * transitive-closure alternative lives in [[Dedup.resolvePairs]] and
  * is gated separately by q_dedup_resolve*; callers wanting
  * component-exact clusters can feed [[pairs]] into it.)
  *
  * Engine parity: vectors are pre-normalized (cosine = dot), the dot is
  * the same double left-fold as every similarity operator here, and the
  * k-means is the deterministic min-id-init Lloyd of
  * [[Similarity.kmeansCells]], which the oracle unrolls exactly.
  */
object SemDedup {

  /** Cells larger than this are dropped from the pair search (skew
    * guard, mirrored from the LSH bucket cap). At gate scale no cell
    * comes near it, so the oracle can mirror the cap as a no-op.
    */
  val MaxCellSize = 4096

  /** Near-dup PAIRS within k-means cells: (id_a, id_b, cosine ≥
    * threshold), id_a < id_b, both in the same cell.
    */
  def pairs(df: DataFrame, vecCol: String, idCol: String,
            k: Int, iters: Int, threshold: Double,
            maxCellSize: Int = MaxCellSize): DataFrame = {
    val cells = Similarity.kmeansCells(df, vecCol, idCol, k, iters)
    val m = df.select(col(idCol).as("id"), col(vecCol).as("_v"))
      .join(cells.select(col(idCol).as("id"), col("cell")), Seq("id"))
    val capped = Dedup.capBuckets(m, Seq("cell"), maxCellSize)
    capped.as("a").join(capped.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("cosine", round(Similarity.dot(col("a._v"), col("b._v")), 6))
      .filter(col("cosine") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cosine"))
  }

  /** The dedup itself: drop every row that has a SMALLER-id near-dup in
    * its cell (the paper's greedy keep-one policy; `id_b` of any pair is
    * by construction the larger id, so the drop set is just the distinct
    * right column).
    */
  def dedup(df: DataFrame, vecCol: String, idCol: String,
            k: Int, iters: Int, threshold: Double,
            maxCellSize: Int = MaxCellSize): DataFrame = {
    val losers = pairs(df, vecCol, idCol, k, iters, threshold, maxCellSize)
      .select(col("id_b").as("_loser")).distinct()
    df.join(losers, df(idCol) === losers("_loser"), "left_anti")
  }

  /** Rows the cell cap of [[pairs]] would drop at these parameters —
    * the cap's recall cost as a QUERYABLE one-row metric (rows in
    * k-means cells above `maxCellSize`), for
    * [[Pipeline.capDropReport]] / the health report.
    */
  def cellCapDropCount(df: DataFrame, vecCol: String, idCol: String,
                       k: Int, iters: Int,
                       maxCellSize: Int = MaxCellSize): DataFrame =
    Similarity.kmeansCells(df, vecCol, idCol, k, iters)
      .groupBy(col("cell")).agg(count(lit(1)).as("_cn"))
      .agg(coalesce(sum(when(col("_cn") > maxCellSize, col("_cn"))
        .otherwise(0L)), lit(0L)).as("dropped_rows"),
        coalesce(sum(col("_cn")), lit(0L)).as("total_rows"))

  /** DuckDB twin of [[cellCapDropCount]] — the same cell-size census
    * over the unrolled k-means relation.
    */
  def duckCellCapDropCount(tbl: String, vecCol: String, idCol: String,
                           k: Int, iters: Int, dim: Int,
                           maxCellSize: Int = MaxCellSize): String =
    s"""SELECT coalesce(CAST(sum(CASE WHEN cn > $maxCellSize THEN cn ELSE 0 END) AS BIGINT),
       |                CAST(0 AS BIGINT)) AS dropped_rows,
       |       coalesce(CAST(sum(cn) AS BIGINT), CAST(0 AS BIGINT)) AS total_rows
       |FROM (SELECT count(*) AS cn
       |      FROM ${Similarity.duckKmeansRel(tbl, vecCol, idCol, k, iters, dim)} x
       |      GROUP BY cell)""".stripMargin

  /** DuckDB oracle twin of [[dedup]]: unrolled k-means cells →
    * within-cell cosine pairs → greedy smaller-id drop. Emits only
    * (idCol, keepCols…) — array columns stay out of the compared output.
    */
  def duckDedup(tbl: String, vecCol: String, idCol: String,
                k: Int, iters: Int, dim: Int, threshold: Double,
                keepCols: Seq[String]): String = {
    val km = Similarity.duckKmeansRel(tbl, vecCol, idCol, k, iters, dim)
    s"""WITH km AS (SELECT * FROM $km x),
       |p AS (SELECT a.$idCol AS id_a, b.$idCol AS id_b
       |      FROM km a JOIN km b ON a.cell = b.cell AND a.$idCol < b.$idCol
       |      WHERE round(list_dot_product(CAST(a.$vecCol AS DOUBLE[]),
       |                                   CAST(b.$vecCol AS DOUBLE[])), 6) >= $threshold)
       |SELECT $idCol, ${keepCols.mkString(", ")} FROM $tbl d
       |WHERE d.$idCol NOT IN (SELECT id_b FROM p)""".stripMargin
  }
}
