package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tabular feature-engineering operators — the encode-before-training
  * stage of an ML data pipeline, next to [[Curriculum]]'s selection and
  * [[Splits]]' assignment.
  */
object Features {

  private def d38(c: Column) = c.cast("decimal(38,0)")

  /** Leave-one-out target encoding of a categorical column: each row's
    * feature is the mean target of its OWN category computed WITHOUT
    * the row itself,
    *
    *   loo_i = (Σ_c y − y_i) / (n_c − 1),
    *
    * the standard high-cardinality categorical encoder that plain
    * mean-encoding leaks (a row seeing its own label inflates holdout
    * metrics; LOO removes exactly that self-leak). Singleton categories
    * encode NULL — the caller decides the fallback prior.
    *
    * Exactness: per-category sums are micro-integer DECIMAL(38,0), the
    * subtraction stays integral, ONE double division per row — both
    * engines agree bitwise before the 6 dp round.
    *
    * Scale shape: one map-side-combinable category aggregate
    * (category-cardinality output) broadcast-joined back to the rows —
    * the corpus is touched once and never shuffled by category. The
    * broadcast hint is right while the category table fits an executor
    * (≲10⁷ categories × 24 B); past that, drop the hint and let AQE
    * pick the shuffle join — the LOO arithmetic is unchanged.
    *
    * Output: (idCol, catCol, loo).
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
                      targetCol: String): DataFrame = {
    val micro = round(col(targetCol) * lit(1000000.0)).cast("long")
    val rows = df.select(col(idCol), col(catCol), micro.as("_m"))
    val cat = rows.groupBy(col(catCol))
      .agg(sum(d38(col("_m"))).as("_s"), count(lit(1)).as("_n"))
    rows.join(broadcast(cat), Seq(catCol))
      .select(col(idCol), col(catCol),
        when(col("_n") > 1,
          round((col("_s") - d38(col("_m"))).cast("double")
            / (col("_n") - lit(1L)).cast("double") / lit(1000000.0), 6))
          .as("loo"))
  }

  /** DuckDB oracle twin of [[targetEncodeLoo]]. */
  def duckTargetEncodeLoo(rel: String, idCol: String, catCol: String,
                          targetCol: String): String =
    s"""WITH rows_ AS (
       |  SELECT $idCol, $catCol,
       |         CAST(round($targetCol * 1000000.0) AS BIGINT) AS m
       |  FROM $rel),
       |cat AS (
       |  SELECT $catCol, sum(CAST(m AS HUGEINT)) AS s,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM rows_ GROUP BY 1)
       |SELECT r.$idCol, r.$catCol,
       |       CASE WHEN c.n > 1 THEN
       |         round(CAST(c.s - CAST(r.m AS HUGEINT) AS DOUBLE)
       |               / CAST(c.n - 1 AS DOUBLE) / 1000000.0, 6)
       |       END AS loo
       |FROM rows_ r JOIN cat c USING ($catCol)""".stripMargin

  /** Cross-group QUANTILE NORMALIZATION of a score column — the
    * batch-effect remover of multi-source pipelines: two crawl sources
    * (or two annotator pools, two model checkpoints) score on different
    * scales, so comparing or thresholding raw scores favors whichever
    * source runs hot; quantile normalization replaces each row's score
    * by the POOLED distribution's value at the row's within-group
    * relative rank, making every group's normalized distribution
    * (piecewise) identical.
    *
    * Grid discipline: the exact transform needs "pooled value at
    * arbitrary rank r·N/n_g", which is either a global row_number (a
    * single-partition sort — forbidden at scale, the token-budget
    * lesson) or a non-equi rank join (plans nested-loop). Instead the
    * mapping is materialized at `grid` fixed percentile points — an
    * all-integer bucket per row (⌈grid·r/n_g⌉ from the group window)
    * equi-joined against a grid-sized broadcast lookup built from the
    * distinct-value cumulative table (the q_ks_test discipline: windows
    * run over value cardinality, never the corpus). Piecewise-constant
    * on 1/grid-quantile steps — grid=100 keeps the within-group order
    * up to percentile resolution, which is what downstream thresholds
    * consume.
    *
    * Scale shape: one group-keyed window exchange (rank + group size,
    * same partition), one value-cardinality aggregate + window for the
    * pooled lookup, one BROADCAST equi-join on bucket. All-integer
    * ranks and buckets; score micro-integers end to end.
    *
    * Output: (idCol, groupCol, score, bucket, norm_score).
    */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
                        scoreCol: String, grid: Int = 100): DataFrame = {
    require(grid >= 2 && grid <= 100000, s"quantileNormalize: grid=$grid")
    val micro = round(col(scoreCol).cast("double") * 1e6).cast("long")
    val rows = df.select(col(idCol), col(groupCol), micro.as("_m"))
    // within-group integer rank and size from ONE window exchange
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_m").asc, col(idCol).asc)
    val sizeW = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val bucketed = rows
      .withColumn("_r", row_number().over(rankW).cast("long"))
      .withColumn("_ng", count(lit(1L)).over(sizeW))
      .withColumn("bucket",
        expr(s"(_r * $grid + _ng - 1L) DIV _ng"))
    // pooled lookup: value at rank ⌈b·N/grid⌉ for b = 1..grid, from the
    // distinct-value cumulative table; each value row covers buckets
    // (grid·prev/N, grid·cum/N] — exploded to a grid-sized frame
    val byVal = rows.groupBy(col("_m")).agg(count(lit(1L)).as("_c"))
    val cumW = org.apache.spark.sql.expressions.Window.orderBy(col("_m").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val totW = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val lookup = byVal
      .withColumn("_cum", sum(col("_c")).over(cumW))
      .withColumn("_n", sum(col("_c")).over(totW))
      .withColumn("_lo", expr(s"(_cum - _c) * $grid DIV _n + 1L"))
      .withColumn("_hi", expr(s"_cum * $grid DIV _n"))
      // Spark's sequence(a, b) DESCENDS when a > b — an empty cover
      // range must become an empty array, not a reversed one
      .select(col("_m").as("_nv"),
        when(col("_lo") <= col("_hi"), sequence(col("_lo"), col("_hi")))
          .otherwise(array().cast("array<long>")).as("_bs"))
      .select(explode(col("_bs")).as("bucket"), col("_nv"))
    bucketed.join(broadcast(lookup), Seq("bucket"))
      .select(col(idCol), col(groupCol),
        round(col("_m").cast("double") / 1e6, 6).as("score"),
        col("bucket"),
        round(col("_nv").cast("double") / 1e6, 6).as("norm_score"))
  }

  /** DuckDB oracle twin of [[quantileNormalize]] — same integer ranks,
    * buckets, and pooled order statistics.
    */
  def duckQuantileNormalize(rel: String, idCol: String, groupCol: String,
                            scoreCol: String, grid: Int = 100): String =
    s"""WITH rows_ AS (
       |  SELECT $idCol, $groupCol,
       |         CAST(round(CAST($scoreCol AS DOUBLE) * 1000000.0) AS BIGINT) AS m
       |  FROM $rel),
       |bk AS (
       |  SELECT $idCol, $groupCol, m,
       |         (CAST(row_number() OVER (PARTITION BY $groupCol
       |                                  ORDER BY m ASC, $idCol ASC) AS BIGINT)
       |            * $grid
       |          + CAST(count(*) OVER (PARTITION BY $groupCol) AS BIGINT) - 1)
       |           // CAST(count(*) OVER (PARTITION BY $groupCol) AS BIGINT)
       |           AS bucket
       |  FROM rows_),
       |bv AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM rows_ GROUP BY m),
       |cum AS (SELECT m, c,
       |               sum(c) OVER (ORDER BY m ASC
       |                            ROWS UNBOUNDED PRECEDING) AS cum,
       |               sum(c) OVER () AS n
       |        FROM bv),
       |lookup AS (
       |  SELECT unnest(generate_series(
       |           CAST((cum - c) * $grid // n + 1 AS BIGINT),
       |           CAST(cum * $grid // n AS BIGINT))) AS bucket,
       |         m AS nv
       |  FROM cum)
       |SELECT b.$idCol, b.$groupCol,
       |       round(CAST(b.m AS DOUBLE) / 1e6, 6) AS score,
       |       b.bucket,
       |       round(CAST(l.nv AS DOUBLE) / 1e6, 6) AS norm_score
       |FROM bk b JOIN lookup l USING (bucket)""".stripMargin
}
