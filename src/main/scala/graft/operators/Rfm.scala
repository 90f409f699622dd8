package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) customer segmentation over the
  * conversion stream — the classic lifecycle-marketing matrix
  * ("champions", "at risk", "hibernating") as segment-level counts.
  *
  * Tiers come from FIXED caller thresholds, not NTILE quantiles: at
  * cluster scale a population NTILE is a single-partition global window
  * (and its cuts drift with every data refresh — segment definitions
  * should be stable policy, not data artifacts). That makes the whole
  * operator ONE user-keyed exchange (per-user last-ts/count/sum) + a
  * narrow tier map + one tiny (≤ 27-row) aggregate.
  *
  * Determinism: recency is integer floor-days; frequency integer;
  * monetary a DECIMAL(18,6) sum compared/emitted as DOUBLE (one exact
  * conversion) — tier edges and totals are hash-exact cross-engine.
  * Tier 1 is BEST (recent / frequent / big spender).
  */
object Rfm {

  /** @param refMs   "now" for recency, epoch ms; must be ≥ every
    *                conversion ts (recency is floor((ref − last)/day)).
    * @param rDays   (t1, t2): tier 1 if recency < t1 days, 2 if < t2, else 3
    * @param fCounts (t1, t2): tier 1 if count ≥ t1, 2 if ≥ t2, else 3
    * @param mValues (t1, t2): tier 1 if sum ≥ t1, 2 if ≥ t2, else 3
    *
    * Output: (r_tier, f_tier, m_tier, n_users, total_value) for
    * non-empty cells.
    */
  def segments(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, valueCol: String, convType: String,
               refMs: Long, rDays: (Int, Int), fCounts: (Long, Long),
               mValues: (Double, Double)): DataFrame = {
    def tier(v: Column, best: Column, mid: Column): Column =
      when(best, 1).when(mid, 2).otherwise(3)
    val perUser = events.filter(col(typeCol) === convType)
      .groupBy(col(userCol))
      .agg(max(unix_millis(col(tsCol))).as("_last"),
        count(lit(1)).as("_f"),
        sum(col(valueCol).cast("decimal(18,6)")).as("_m"))
      .withColumn("_rdays", expr(s"($refMs - _last) div 86400000"))
    perUser
      .select(
        tier(col("_rdays"), col("_rdays") < rDays._1, col("_rdays") < rDays._2)
          .as("r_tier"),
        tier(col("_f"), col("_f") >= fCounts._1, col("_f") >= fCounts._2)
          .as("f_tier"),
        tier(col("_m"), col("_m").cast("double") >= mValues._1,
          col("_m").cast("double") >= mValues._2).as("m_tier"),
        col("_m"))
      .groupBy(col("r_tier"), col("f_tier"), col("m_tier"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("_m")).cast("double").as("total_value"))
  }

  /** DuckDB oracle twin of [[segments]]. */
  def duckSegments(rel: String, userCol: String, tsCol: String,
                   typeCol: String, valueCol: String, convType: String,
                   refMs: Long, rDays: (Int, Int), fCounts: (Long, Long),
                   mValues: (Double, Double)): String =
    s"""WITH u AS (
       |  SELECT $userCol,
       |         ($refMs - epoch_ms(max($tsCol))) // 86400000 AS rdays,
       |         CAST(count(*) AS BIGINT) AS f,
       |         sum(CAST($valueCol AS DECIMAL(18,6))) AS m
       |  FROM $rel WHERE $typeCol = '${convType.replace("'", "''")}'
       |  GROUP BY 1),
       |t AS (SELECT
       |        CASE WHEN rdays < ${rDays._1} THEN 1
       |             WHEN rdays < ${rDays._2} THEN 2 ELSE 3 END AS r_tier,
       |        CASE WHEN f >= ${fCounts._1} THEN 1
       |             WHEN f >= ${fCounts._2} THEN 2 ELSE 3 END AS f_tier,
       |        CASE WHEN CAST(m AS DOUBLE) >= ${mValues._1} THEN 1
       |             WHEN CAST(m AS DOUBLE) >= ${mValues._2} THEN 2 ELSE 3 END AS m_tier,
       |        m
       |      FROM u)
       |SELECT r_tier, f_tier, m_tier,
       |       CAST(count(*) AS BIGINT) AS n_users,
       |       CAST(sum(m) AS DOUBLE) AS total_value
       |FROM t GROUP BY 1, 2, 3""".stripMargin
}
