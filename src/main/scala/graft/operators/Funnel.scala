package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the other classic
  * product-analytics operator the reference's event exports feed: for a
  * step sequence (e.g. view → click → purchase), a user converts at
  * step k iff they performed step k at-or-after their earliest
  * conversion time of step k-1.
  *
  * Shape: one filtered aggregate per step, each joined to the previous
  * step's per-user conversion time. Every intermediate is one row per
  * converted user (monotonically shrinking), so the joins get cheaper
  * down the funnel and AQE broadcasts the small sides; the event scan
  * is read once per step with the step predicate pushed to parquet.
  */
object Funnel {

  /** Per-user conversion times: one row per user who completed the whole
    * funnel, with `t1..tN` the earliest valid time of each step.
    */
  def conversions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (prev, (step, i)) =>
        val tcol = s"t${i + 1}"
        val stepEvents = events.filter(col(typeCol) === step)
        val converted = prev match {
          case None =>
            stepEvents.groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol))
          case Some(p) =>
            stepEvents.join(p, userCol)
              .filter(col(tsCol) >= col(s"t$i"))
              .groupBy((col(userCol) +: (1 to i).map(j => col(s"t$j"))): _*)
              .agg(min(col(tsCol)).as(tcol))
        }
        Some(converted)
    }.get
  }

  /** Funnel summary: one row per step with the converted-user count. */
  def stepCounts(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String]): DataFrame = {
    val frames = steps.indices.map { i =>
      conversions(events, userCol, tsCol, typeCol, steps.take(i + 1))
        .agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("n_users"))
    }
    frames.reduce(_ union _)
  }

  /** DuckDB oracle for [[stepCounts]] with three steps (the gate query
    * shape): chained min-after-previous-step CTEs, identical semantics.
    */
  def duckStepCounts3(rel: String, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String]): String = {
    require(steps.length == 3, "oracle helper renders the 3-step shape")
    val Seq(s1, s2, s3) = steps
    s"""WITH c1 AS (
       |  SELECT $userCol, min($tsCol) AS t1 FROM $rel
       |  WHERE $typeCol = '$s1' GROUP BY $userCol),
       |c2 AS (
       |  SELECT e.$userCol, c1.t1, min(e.$tsCol) AS t2 FROM $rel e
       |  JOIN c1 ON e.$userCol = c1.$userCol
       |  WHERE e.$typeCol = '$s2' AND e.$tsCol >= c1.t1
       |  GROUP BY e.$userCol, c1.t1),
       |c3 AS (
       |  SELECT e.$userCol, c2.t1, c2.t2, min(e.$tsCol) AS t3 FROM $rel e
       |  JOIN c2 ON e.$userCol = c2.$userCol
       |  WHERE e.$typeCol = '$s3' AND e.$tsCol >= c2.t2
       |  GROUP BY e.$userCol, c2.t1, c2.t2)
       |SELECT 1 AS step, '$s1' AS event_type, (SELECT count(*) FROM c1) AS n_users
       |UNION ALL
       |SELECT 2, '$s2', (SELECT count(*) FROM c2)
       |UNION ALL
       |SELECT 3, '$s3', (SELECT count(*) FROM c3)""".stripMargin
  }
}
