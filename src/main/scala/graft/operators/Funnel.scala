package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis over an event stream — the other classic
  * product-analytics operator the reference's event exports feed: for a
  * step sequence (e.g. view → click → purchase), a user converts at
  * step k iff they performed step k at-or-after their earliest
  * conversion time of step k-1.
  *
  * Shape: a TRUE single pass — one scan of the events (only step-typed
  * rows survive the pushed filter), one shuffle on the user key, and a
  * per-user time-sorted fold that fills the step-time vector in order.
  * No joins, no per-step re-aggregation, and the plan is linear in the
  * number of steps (a join-chain formulation embeds the previous frame
  * twice per step — exponential static plans past a handful of steps).
  * The per-user state is its step-typed events; Spark's object hash
  * aggregate falls back to sort-based spill under memory pressure, so
  * heavy users degrade to disk, not OOM.
  */
object Funnel {

  /** Per-user conversion times for the full step sequence, computed in a
    * single pass: one row per user who completed step 1, with `t1..tN`
    * the earliest valid time of each step and `t_k` NULL from the first
    * step the user did not reach.
    *
    * Semantics of the fold (equal to the chained min-after-previous
    * joins): events sorted by (ts, step index) — ties process the
    * earlier step first, so a same-timestamp next-step event still
    * converts (inclusive `>=` bound, like the reference's time filters);
    * `t_k` is set by the first step-k event at-or-after `t_(k-1)`.
    */
  def conversionTimes(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val n = steps.length
    val tsType = events.schema(tsCol).dataType
    val stepIdx = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val se = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol),
        struct(col(tsCol).as("ts"), stepIdx.as("s")).as("_e"))
    val folded = se.groupBy(col(userCol))
      .agg(sort_array(collect_list(col("_e"))).as("_es"))
      .withColumn("_ts", aggregate(
        col("_es"),
        array_repeat(lit(null).cast(tsType), n),
        (acc, e) => {
          val s = e.getField("s")
          val ts = e.getField("ts")
          val eligible = element_at(acc, s + 1).isNull &&
            (s === 0 || (element_at(acc, s).isNotNull && ts >= element_at(acc, s)))
          transform(sequence(lit(0), lit(n - 1)), i =>
            when(i === s && eligible, ts).otherwise(element_at(acc, i + 1)))
        }))
    folded.select(col(userCol) +:
        (1 to n).map(k => element_at(col("_ts"), k).as(s"t$k")): _*)
      .filter(col("t1").isNotNull)
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
  /** The shared chained min-after-previous-step CTE chain (c1, c2, c3)
    * mirroring [[conversionTimes]] for the 3-step oracle shape.
    */
  private def duckConvCtes3(rel: String, userCol: String, tsCol: String,
                            typeCol: String, steps: Seq[String]): String = {
    require(steps.length == 3, "oracle helper renders the 3-step shape")
    val Seq(s1, s2, s3) = steps
    s"""c1 AS (
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
       |  GROUP BY e.$userCol, c2.t1, c2.t2)""".stripMargin
  }

  def duckStepCounts3(rel: String, userCol: String, tsCol: String,
                      typeCol: String, steps: Seq[String]): String = {
    val Seq(s1, s2, s3) = steps
    s"""WITH ${duckConvCtes3(rel, userCol, tsCol, typeCol, steps)}
       |SELECT 1 AS step, '$s1' AS event_type, (SELECT count(*) FROM c1) AS n_users
       |UNION ALL
       |SELECT 2, '$s2', (SELECT count(*) FROM c2)
       |UNION ALL
       |SELECT 3, '$s3', (SELECT count(*) FROM c3)""".stripMargin
  }

  /** Time-to-convert distribution per funnel transition: for every user
    * reaching step k+1, the latency t_{k+1} − t_k in EXACT integer
    * milliseconds, summarized as n_users + interpolated p50/p90 (the
    * q_len_quantiles convention: exact `percentile` — group cardinality
    * is the converted-user count, fine to sort within; at extreme scale
    * swap in the GK sketch like q_quantile_sketch).
    *
    * One conversion pass (the [[conversionTimes]] user-key exchange),
    * one inline stack reshape (no per-step re-scan), one step-keyed
    * aggregate over ≤ (n−1)·users rows.
    * Output: (step, n_users, p50_ms, p90_ms) for steps 2..n.
    */
  def stepLatency(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.length >= 2, "stepLatency needs at least two steps")
    val conv = conversionTimes(events, userCol, tsCol, typeCol, steps)
    val stacked = (1 until steps.length).map { k =>
      struct(lit(k + 1).as("step"),
        (unix_millis(col(s"t${k + 1}")) - unix_millis(col(s"t$k")))
          .as("lat"))
    }
    conv.select(explode(array(stacked: _*)).as("_l"))
      .select(col("_l.step").as("step"), col("_l.lat").as("_lat"))
      .filter(col("_lat").isNotNull)
      .groupBy(col("step"))
      .agg(count(lit(1)).as("n_users"),
        round(expr("percentile(_lat, 0.5D)"), 6).as("p50_ms"),
        round(expr("percentile(_lat, 0.9D)"), 6).as("p90_ms"))
  }

  /** DuckDB oracle for [[stepLatency]] (3-step shape). */
  def duckStepLatency3(rel: String, userCol: String, tsCol: String,
                       typeCol: String, steps: Seq[String]): String =
    s"""WITH ${duckConvCtes3(rel, userCol, tsCol, typeCol, steps)},
       |l AS (SELECT 2 AS step, epoch_ms(t2) - epoch_ms(t1) AS lat FROM c2
       |      UNION ALL
       |      SELECT 3, epoch_ms(t3) - epoch_ms(t2) FROM c3)
       |SELECT step, CAST(count(*) AS BIGINT) AS n_users,
       |       round(quantile_cont(lat, 0.5), 6) AS p50_ms,
       |       round(quantile_cont(lat, 0.9), 6) AS p90_ms
       |FROM l GROUP BY 1""".stripMargin
}
