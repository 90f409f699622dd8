package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weekly cohort retention over an event stream: users are cohorted by
  * the week of their first event; retention counts how many of each
  * cohort were active k weeks later.
  *
  * Shape: per-user first-event agg (one shuffle on user) → join back to
  * events on user (same key — no re-shuffle of the agg side) → distinct
  * (cohort, offset, user) → count per (cohort, offset). Week arithmetic
  * is integer day-diff division, so the DuckDB oracle matches exactly.
  */
object Retention {

  def weeklyCohorts(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val firstWeek = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    events.select(col(userCol), col(tsCol))
      .join(firstWeek, userCol)
      .select(col(userCol), col("cohort_week"),
        (datediff(date_trunc("week", col(tsCol)), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .distinct()
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** DuckDB oracle for [[weeklyCohorts]] over relation `rel` (pass the
    * relation UNaliased — the template binds its own aliases).
    */
  def duckWeeklyCohorts(rel: String, userCol: String, tsCol: String): String =
    s"""WITH fw AS (
       |  SELECT $userCol, date_trunc('week', min($tsCol)) AS cohort_week
       |  FROM $rel src GROUP BY $userCol),
       |act AS (
       |  SELECT DISTINCT e.$userCol, fw.cohort_week,
       |    CAST(date_diff('day', fw.cohort_week, date_trunc('week', e.$tsCol)) // 7 AS BIGINT)
       |      AS week_offset
       |  FROM $rel e JOIN fw ON e.$userCol = fw.$userCol)
       |SELECT cohort_week, week_offset, count(*) AS n_users
       |FROM act GROUP BY cohort_week, week_offset""".stripMargin
}
