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

  /** LINEAR (multi-touch) attribution: every touch inside the lookback
    * window shares the conversion's value EQUALLY — the even-credit
    * counterpart of [[lastTouch]] (which gives the final touch
    * everything).
    *
    * Credit arithmetic is FIXED-POINT INTEGER (the PageRank posture):
    * the value becomes micro-units via floor(value·10⁶) and each touch
    * receives `micros div n_touches` — exact, order-independent,
    * oracle-hash-identical; the division remainder (< n_touches µ-units
    * per conversion, ≤ 10⁻⁶ of a unit each) is dropped, documented, and
    * far below the 6-dp output rounding.
    *
    * Scale shape: the touch×window pairing runs through
    * [[RangeJoin.bucketedIntervalJoin]] keyed by the user — a bucket+
    * user EQUI-join (never a nested-loop time predicate), with pair
    * volume bounded by per-user touches × conversions inside the
    * lookback. The per-conversion touch count is one window over the
    * conversion key; unattributed conversions arrive via a broadcast-
    * able anti join of the (small) attributed-conversion id set.
    *
    * Output: (touch_type, conversions, attributed_value) — conversions
    * = DISTINCT conversions crediting the type, so the column sums
    * across types can exceed the total conversion count (a conversion
    * credits several types); `(none)` rows carry full value.
    */
  def linearTouch(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, valueCol: String,
                  touchTypes: Seq[String], convType: String,
                  lookbackMs: Long): DataFrame = {
    require(!touchTypes.contains(convType),
      s"linearTouch: convType '$convType' must not be a touch type")
    val lookbackUs = lookbackMs * 1000L
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).as("_u"), unix_micros(col(tsCol)).as("_tus"),
        col(typeCol).as("touch_type"))
    val conv = events.filter(col(typeCol) === convType)
      .select(col(userCol).as("_u"), col(idCol).as("_cid"),
        unix_micros(col(tsCol)).as("_cus"),
        floor(col(valueCol) * 1e6).cast("long").as("_vmic"))
    val windows = conv.select(col("_u"), col("_cid"), col("_vmic"),
      (col("_cus") - lookbackUs).as("_start"), (col("_cus") + 1L).as("_end"))
    val joined = RangeJoin.bucketedIntervalJoin(
      touches, "_tus", windows, "_start", "_end",
      bucketUs = lookbackUs + 1L, keys = Seq("_u"))
    val w = Window.partitionBy(col("_cid"))
    val shares = joined
      .withColumn("_n", count(lit(1)).over(w))
      .select(col("_cid"), col("touch_type"),
        expr("_vmic div _n").as("_share"))
    val attributed = shares.groupBy(col("touch_type"))
      .agg(count_distinct(col("_cid")).as("conversions"),
        sum(col("_share")).as("_mic"))
    val none = conv.join(shares.select("_cid").distinct(),
        Seq("_cid"), "left_anti")
      .agg(count(lit(1)).as("conversions"), sum(col("_vmic")).as("_mic"))
      .select(lit("(none)").as("touch_type"), col("conversions"), col("_mic"))
      .filter(col("conversions") > 0L)
    attributed.unionByName(none)
      .select(col("touch_type"), col("conversions"),
        round(col("_mic").cast("double") / 1e6, 6).as("attributed_value"))
  }

  /** DuckDB oracle twin of [[linearTouch]] — the naive per-user time
    * predicate (the bucketed join is an execution strategy, not a
    * semantics), identical integer micro-credit arithmetic.
    */
  def duckLinearTouch(rel: String, userCol: String, tsCol: String,
                      idCol: String, typeCol: String, valueCol: String,
                      touchTypes: Seq[String], convType: String,
                      lookbackMs: Long): String = {
    val inList = touchTypes.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val conv = s"'${convType.replace("'", "''")}'"
    val lookbackUs = lookbackMs * 1000L
    s"""WITH tch AS (SELECT $userCol AS u, epoch_us($tsCol) AS tus,
       |                    $typeCol AS touch_type
       |             FROM $rel WHERE $typeCol IN ($inList)),
       |cv AS (SELECT $userCol AS u, $idCol AS cid, epoch_us($tsCol) AS cus,
       |              CAST(floor($valueCol * 1e6) AS BIGINT) AS vmic
       |       FROM $rel WHERE $typeCol = $conv),
       |j AS (SELECT cv.cid, cv.vmic, tch.touch_type
       |      FROM tch JOIN cv ON tch.u = cv.u
       |        AND tch.tus >= cv.cus - $lookbackUs AND tch.tus <= cv.cus),
       |sh AS (SELECT cid, touch_type,
       |              vmic // (count(*) OVER (PARTITION BY cid)) AS share
       |       FROM j),
       |att AS (SELECT touch_type,
       |               CAST(count(DISTINCT cid) AS BIGINT) AS conversions,
       |               CAST(sum(share) AS BIGINT) AS mic
       |        FROM sh GROUP BY 1),
       |none AS (SELECT '(none)' AS touch_type,
       |                CAST(count(*) AS BIGINT) AS conversions,
       |                CAST(sum(vmic) AS BIGINT) AS mic
       |         FROM cv WHERE cid NOT IN (SELECT cid FROM sh)
       |         HAVING count(*) > 0)
       |SELECT touch_type, conversions,
       |       round(CAST(mic AS DOUBLE) / 1e6, 6) AS attributed_value
       |FROM (SELECT * FROM att UNION ALL SELECT * FROM none)""".stripMargin
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
