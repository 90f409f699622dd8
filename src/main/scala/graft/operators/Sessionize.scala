package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream — the classic
  * event-analytics operator the reference's `events`-shaped tables feed
  * into downstream: a new session starts when the gap to the previous
  * event of the same user exceeds `gapMs`.
  *
  * Plan shape: one hash-partition exchange on the user key serves BOTH
  * windows (lag and running sum — same partitioning and ordering, Spark
  * plans one Window operator pair over one Exchange), then a partial+
  * final hash agg on (user, session) that reuses the same partitioning —
  * no second shuffle of the events. Integer µs arithmetic throughout, so
  * the DuckDB oracle matches exactly.
  */
object Sessionize {

  /** Per-event session index (0-based) for each user: `sessionIdx`
    * increments whenever the gap to the previous event exceeds gapMs.
    * `tieBreaker` makes the ordering total when timestamps collide.
    */
  def withSessionIdx(df: DataFrame, userCol: String, tsCol: String,
                     tieBreaker: String, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieBreaker))
    val prevUs = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(prevUs.isNull, 0L)
      .otherwise((unix_micros(col(tsCol)) - prevUs > gapMs * 1000L).cast("long"))
    df.withColumn("_new_session", isNew)
      .withColumn("session_idx",
        sum(col("_new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_new_session")
  }

  /** Per-session rollup: start/end timestamps, event count, summed
    * value. One exchange total (windows + agg share the user-key
    * partitioning).
    */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
               tieBreaker: String, valueCol: String, gapMs: Long): DataFrame =
    withSessionIdx(df, userCol, tsCol, tieBreaker, gapMs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double").as("total_value"))

  /** DuckDB oracle for [[sessions]] over relation `rel` (identical window
    * + agg formulation; µs epoch arithmetic both sides).
    */
  def duckSessions(rel: String, userCol: String, tsCol: String,
                   tieBreaker: String, valueCol: String, gapMs: Long): String =
    s"""WITH flagged AS (
       |  SELECT *,
       |    CASE WHEN lag(epoch_us($tsCol)) OVER w IS NULL THEN 0
       |         WHEN epoch_us($tsCol) - lag(epoch_us($tsCol)) OVER w > ${gapMs * 1000L} THEN 1
       |         ELSE 0 END AS new_session
       |  FROM $rel
       |  WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $tieBreaker)),
       |s AS (
       |  SELECT *, CAST(sum(new_session) OVER (
       |    PARTITION BY $userCol ORDER BY $tsCol, $tieBreaker
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM flagged)
       |SELECT $userCol, session_idx,
       |       min($tsCol) AS session_start, max($tsCol) AS session_end,
       |       count(*) AS n_events,
       |       CAST(sum(CAST($valueCol AS DECIMAL(18,6))) AS DOUBLE) AS total_value
       |FROM s GROUP BY $userCol, session_idx""".stripMargin

  /** TOP SESSION PATHS — the Sankey/flow-analysis source: each
    * session's first `maxSteps` event types joined into a path string,
    * ranked by session count. "Where do users actually go" in one
    * query.
    *
    * Scale shape: the session windows and the per-session fold share
    * ONE user-key exchange (groupBy(user, session) extends the window
    * partitioning); the path ranking is a path-cardinality aggregate
    * behind TakeOrdered — no global sort. Per-session event lists are
    * bounded by session length (gap-bounded by construction).
    *
    * Determinism: in-session order is (ts, tieBreaker); ranking ties
    * break on the path string.
    * Output: (path, n_sessions), top `k`.
    */
  def topPaths(df: DataFrame, userCol: String, tsCol: String,
               tieBreaker: String, typeCol: String, gapMs: Long,
               maxSteps: Int, k: Int): DataFrame =
    withSessionIdx(df, userCol, tsCol, tieBreaker, gapMs)
      .groupBy(col(userCol), col("session_idx"))
      .agg(sort_array(collect_list(struct(col(tsCol).as("_ts"),
        col(tieBreaker).as("_tb"), col(typeCol).as("_t")))).as("_e"))
      .select(concat_ws(" > ",
        slice(transform(col("_e"), e => e.getField("_t")), 1, maxSteps))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)

  /** DuckDB oracle for [[topPaths]]. */
  def duckTopPaths(rel: String, userCol: String, tsCol: String,
                   tieBreaker: String, typeCol: String, gapMs: Long,
                   maxSteps: Int, k: Int): String =
    s"""WITH flagged AS (
       |  SELECT *,
       |    CASE WHEN lag(epoch_us($tsCol)) OVER w IS NULL THEN 0
       |         WHEN epoch_us($tsCol) - lag(epoch_us($tsCol)) OVER w > ${gapMs * 1000L} THEN 1
       |         ELSE 0 END AS new_session
       |  FROM $rel
       |  WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $tieBreaker)),
       |s AS (
       |  SELECT *, CAST(sum(new_session) OVER (
       |    PARTITION BY $userCol ORDER BY $tsCol, $tieBreaker
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
       |  FROM flagged),
       |p AS (
       |  SELECT array_to_string(
       |           list($typeCol ORDER BY $tsCol, $tieBreaker)[1:$maxSteps],
       |           ' > ') AS path
       |  FROM s GROUP BY $userCol, session_idx)
       |SELECT path, count(*) AS n_sessions
       |FROM p GROUP BY path
       |ORDER BY n_sessions DESC, path ASC LIMIT $k""".stripMargin
}
