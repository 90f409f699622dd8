package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KAPLAN–MEIER survival estimation over user lifetimes — retention's
  * statistically honest cousin: a plain "fraction still active after t
  * days" curve treats every user who joined recently as churned, while
  * the KM estimator CENSORS them (they leave the risk set without
  * counting as an event):
  *
  *   S(t) = Π_{u ≤ t, d_u > 0} (1 − d_u / n_u)
  *
  * with n_u = users whose lifetime is ≥ u (at risk), d_u = observed
  * churns exactly at u.
  *
  * Lifetime and churn are defined from the event stream itself: a
  * user's lifetime is last-activity − first-activity in days, and the
  * churn is OBSERVED only when the user has been inactive for at least
  * `horizonDays` before the corpus's last day — anyone active later is
  * censored (lifetime known only to be ≥ its current value).
  *
  * Scale shape: ONE user-keyed exchange builds (first, last) per user;
  * the corpus last-day is a broadcast 1-row aggregate ([[Bm25]]'s
  * stats posture); everything KM runs on the DURATION HISTOGRAM
  * (distinct lifetimes ≤ observed day span — metadata scale), where
  * the at-risk tail sums and the product both live in windows.
  *
  * Float parity: the running product is log-space — each step's
  * ln(1 − d/n) is computed from exact integers and quantized to
  * micro-nat BIGINTs, so the cumulative "product" is an
  * order-independent integer window sum; one exp at the end (both
  * engines see identical integers), 6 dp-rounded. A step that kills
  * the whole risk set (n = d) has no finite log — those and all later
  * rows emit survival 0 via a windowed min of (n − d).
  *
  * Output: (t_days, n_at_risk, n_churned, survival), one row per
  * distinct observed lifetime.
  */
object Survival {

  def kaplanMeier(events: DataFrame, userCol: String, tsCol: String,
                  horizonDays: Int): DataFrame = {
    val users = events.groupBy(col(userCol).as("u"))
      .agg(to_date(min(col(tsCol))).as("f"), to_date(max(col(tsCol))).as("l"))
    val maxDay = users.agg(max(col("l")).as("m"))
    val durs = users.crossJoin(broadcast(maxDay))
      .select(datediff(col("l"), col("f")).cast("long").as("t"),
        (datediff(col("m"), col("l")) >= horizonDays).as("churned"))
    val byT = durs.groupBy(col("t")).agg(
      count(lit(1)).as("ended"),
      count(when(col("churned"), lit(1))).as("d"))
    val atRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val upTo = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n", sum(col("ended")).over(atRisk))
      .withColumn("_lmic",
        when(col("d") === 0, lit(0L)).otherwise(
          round(lit(1000000.0) *
            log((col("n") - col("d")).cast("double") / col("n").cast("double")))
            .cast("long")))
      .withColumn("_cum", sum(col("_lmic")).over(upTo))
      .withColumn("_alive", min(col("n") - col("d")).over(upTo))
      .select(col("t").as("t_days"), col("n").as("n_at_risk"),
        col("d").as("n_churned"),
        when(col("_alive") === 0, lit(0.0))
          .otherwise(round(exp(col("_cum").cast("double") / 1000000.0), 6))
          .as("survival"))
  }

  /** DuckDB oracle twin of [[kaplanMeier]] — identical micro-nat
    * quantization and window frames.
    */
  def duckKaplanMeier(rel: String, userCol: String, tsCol: String,
                      horizonDays: Int): String =
    s"""WITH users AS (
       |  SELECT $userCol AS u, CAST(min($tsCol) AS DATE) AS f,
       |         CAST(max($tsCol) AS DATE) AS l
       |  FROM $rel GROUP BY 1),
       |m AS (SELECT max(l) AS m FROM users),
       |durs AS (
       |  SELECT CAST(datediff('day', f, l) AS BIGINT) AS t,
       |         datediff('day', l, m.m) >= $horizonDays AS churned
       |  FROM users, m),
       |by_t AS (
       |  SELECT t, CAST(count(*) AS BIGINT) AS ended,
       |         CAST(count(*) FILTER (WHERE churned) AS BIGINT) AS d
       |  FROM durs GROUP BY 1),
       |km AS (
       |  SELECT t, d, ended,
       |         CAST(sum(ended) OVER (ORDER BY t
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |           AS BIGINT) AS n
       |  FROM by_t),
       |lg AS (
       |  SELECT t, n, d,
       |         CASE WHEN d = 0 THEN 0 ELSE
       |           CAST(round(1000000.0 *
       |             ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE)))
       |             AS BIGINT) END AS lmic
       |  FROM km)
       |SELECT t AS t_days, n AS n_at_risk, d AS n_churned,
       |       CASE WHEN min(n - d) OVER w = 0 THEN 0.0
       |            ELSE round(exp(CAST(CAST(sum(lmic) OVER w AS BIGINT)
       |                   AS DOUBLE) / 1000000.0), 6) END AS survival
       |FROM lg
       |WINDOW w AS (ORDER BY t
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin
}
