package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversion attribution over the event stream: credit each conversion
  * event to the most recent preceding touch event of the same user
  * within a lookback window (last-touch attribution) — the marketing/
  * product-analytics companion to the reference's event exports
  * (export.py event-table sync surface).
  *
  * Scale shape: ONE exchange on the user key. Non-participating event
  * types are filtered BEFORE the shuffle (pushed to the scan), the
  * last-touch carry is a single running `last(..., ignoreNulls)` window
  * over (user ORDER BY ts, id) — no self-join of touches × conversions,
  * which would be quadratic in per-user activity — and the final
  * aggregate is a map-side-combinable groupBy over touch-type
  * cardinality rows. Per-user partitions bound the sort; user skew is
  * event-stream skew, the same envelope every sessionize/funnel
  * operator in this engine already carries.
  */
object Attribution {

  /** Last-touch attribution. `touchTypes` and `convType` must be
    * disjoint; conversions with no touch inside `lookbackMs` (or no
    * touch at all) are credited to `"(none)"`. A touch at the exact
    * conversion timestamp counts when it sorts first on the (ts, id)
    * tie-break — the deterministic rendering of "at or before".
    *
    * Output: (touch_type, conversions, attributed_value) — the value
    * sum runs in DECIMAL (exact) and is emitted as DOUBLE, so partial-
    * agg order can't perturb low bits (engine/oracle hash parity).
    */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, typeCol: String, valueCol: String,
                touchTypes: Seq[String], convType: String,
                lookbackMs: Long): DataFrame = {
    require(!touchTypes.contains(convType),
      s"lastTouch: convType '$convType' must not be a touch type")
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = events
      .filter(isTouch || col(typeCol) === convType)
      .withColumn("_lt",
        last(when(isTouch,
          struct(col(tsCol).as("_tts"), col(typeCol).as("_tty"))),
          ignoreNulls = true).over(w))
    carried.filter(col(typeCol) === convType)
      .withColumn("touch_type",
        when(col("_lt").isNotNull &&
          unix_millis(col(tsCol)) - unix_millis(col("_lt._tts")) <= lookbackMs,
          col("_lt._tty")).otherwise(lit("(none)")))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("conversions"),
        sum(col(valueCol).cast("decimal(18,6)")).cast("double")
          .as("attributed_value"))
  }

  /** DuckDB oracle twin of [[lastTouch]] — identical running-last window
    * and window-bound arithmetic (epoch_ms ↔ unix_millis).
    */
  def duckLastTouch(rel: String, userCol: String, tsCol: String,
                    idCol: String, typeCol: String, valueCol: String,
                    touchTypes: Seq[String], convType: String,
                    lookbackMs: Long): String = {
    val inList = touchTypes.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val conv = s"'${convType.replace("'", "''")}'"
    s"""WITH e AS (SELECT * FROM $rel
       |           WHERE $typeCol IN ($inList) OR $typeCol = $conv),
       |carried AS (
       |  SELECT $typeCol AS ety, $valueCol AS v, $tsCol AS cts,
       |         last_value(CASE WHEN $typeCol IN ($inList) THEN $tsCol END
       |                    IGNORE NULLS) OVER w AS tts,
       |         last_value(CASE WHEN $typeCol IN ($inList) THEN $typeCol END
       |                    IGNORE NULLS) OVER w AS tty
       |  FROM e
       |  WINDOW w AS (PARTITION BY $userCol ORDER BY $tsCol, $idCol
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT CASE WHEN tts IS NOT NULL
       |                 AND epoch_ms(cts) - epoch_ms(tts) <= $lookbackMs
       |            THEN tty ELSE '(none)' END AS touch_type,
       |       CAST(count(*) AS BIGINT) AS conversions,
       |       CAST(sum(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS attributed_value
       |FROM carried WHERE ety = $conv GROUP BY 1""".stripMargin
  }
}
