package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-series aggregates over the event stream: per-type daily
  * counts with a trailing 7-day window (sum + mean) — the "traffic
  * trend" query every analytics surface runs on ingestion volumes.
  *
  * Scale shape: the raw pass is ONE partial-aggregated `groupBy(type,
  * day)` — the only exchange that touches event-sized data. The rolling
  * window then runs over (type × day) rows, i.e. cardinality bounded by
  * the calendar, not the corpus: at 100 TB of events the window input
  * is still a few thousand rows. A RANGE frame over the integer day
  * index (not ROWS) makes calendar gaps behave: a day with no
  * predecessor rows averages over the days that exist.
  *
  * Engine parity: counts stay integral through the window; the mean is
  * one final double division, round(6).
  */
object Rolling {

  /** Trailing-window length in days (inclusive of the current day). */
  val WindowDays = 7

  /** Per-(event_type, day) counts with trailing 7-day rolling sum and
    * mean. Output: (event_type, ds, n, n_7d, avg_7d).
    */
  def dailyCounts(events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("_day_idx", datediff(col("_day"), lit("1970-01-01")).cast("long"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("_day_idx"))
      .rangeBetween(-(WindowDays - 1), 0)
    daily.select(
      col("event_type"),
      date_format(col("_day"), "yyyy-MM-dd").as("ds"),
      col("n"),
      sum(col("n")).over(w).as("n_7d"),
      round(sum(col("n")).over(w).cast("double")
        / count(col("n")).over(w).cast("double"), 6).as("avg_7d"))
  }

  /** DuckDB oracle twin of [[dailyCounts]] (`tbl` is the events
    * relation with a µs-precision `ts`).
    */
  def duckDailyCounts(tbl: String, tsCol: String, typeCol: String): String =
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS d, count(*) AS n
       |  FROM $tbl GROUP BY 1, 2),
       |w AS (SELECT event_type, d, n,
       |             CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS day_idx
       |      FROM daily)
       |SELECT event_type, strftime(d, '%Y-%m-%d') AS ds, n,
       |       CAST(sum(n) OVER win AS BIGINT) AS n_7d,
       |       round(CAST(sum(n) OVER win AS DOUBLE)
       |             / CAST(count(n) OVER win AS DOUBLE), 6) AS avg_7d
       |FROM w
       |WINDOW win AS (PARTITION BY event_type ORDER BY day_idx
       |               RANGE BETWEEN ${WindowDays - 1} PRECEDING AND CURRENT ROW)""".stripMargin
}
