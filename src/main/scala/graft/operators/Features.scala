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
}
