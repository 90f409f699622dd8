package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the other classic
  * product-analytics operator the reference's event exports feed: for a
  * step sequence (e.g. view → click → purchase), a user converts at
  * step k iff they performed step k at-or-after their earliest
  * conversion time of step k-1.
  *
  * Shape: one filtered aggregate per step, LEFT-joined onto the running
  * per-user conversion frame, so the whole funnel is a single plan in
  * which each step's event scan appears exactly once (the step predicate
  * is pushed to parquet). Per-step counts then fall out of ONE aggregate
  * over the final frame — `count(t_k)` — instead of re-running the
  * conversion chain per step. Every intermediate is one row per step-1
  * user (monotonically shrinking conversion columns), so AQE broadcasts
  * the small sides down the funnel.
  */
object Funnel {

  /** Per-user conversion times for the full step sequence, computed in a
    * single pass: one row per user who completed step 1, with `t1..tN`
    * the earliest valid time of each step and `t_k` NULL from the first
    * step the user did not reach. Each step's events are scanned once.
    */
  def conversionTimes(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      val tcol = s"t${i + 1}"
      // Earliest step-i event at-or-after the user's step-(i-1) time.
      val stepMin = events.filter(col(typeCol) === step)
        .join(prev.select(col(userCol), col(s"t$i")), userCol)
        .filter(col(tsCol) >= col(s"t$i"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol))
      prev.join(stepMin.select(col(userCol).as("__u"), col(tcol)),
          prev(userCol) === col("__u"), "left")
        .drop("__u")
    }
  }

  /** Per-user conversion times of fully-converted users only — one row
    * per user who completed every step (the historical contract).
    */
  def conversions(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame =
    conversionTimes(events, userCol, tsCol, typeCol, steps)
      .filter(col(s"t${steps.length}").isNotNull)

  /** Funnel summary: one row per step with the converted-user count.
    * Single conversion pass + one ungrouped aggregate (`count(t_k)` is
    * non-null-only), then a tiny N-row reshape on the driver side of the
    * plan (literal union — no extra scan).
    */
  def stepCounts(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, steps: Seq[String]): DataFrame = {
    val conv = conversionTimes(events, userCol, tsCol, typeCol, steps)
    val counted = conv.agg(
      count(col("t1")).as("c1"),
      steps.indices.drop(1).map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}")): _*)
    // Reshape the 1×N count row to (step, event_type, n_users) rows via
    // an inline stack — stays one job, no per-step re-aggregation.
    val stacked = steps.indices.map { i =>
      struct(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
        col(s"c${i + 1}").as("n_users"))
    }
    counted.select(explode(array(stacked: _*)).as("_s"))
      .select(col("_s.step"), col("_s.event_type"), col("_s.n_users"))
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
