package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Event-stream profiling operators: pivoted daily activity matrices,
  * trailing-window anomaly scores, and semi-structured JSON property
  * extraction — the monitoring/profiling companions to the reference's
  * event-table exports.
  */
object EventStats {

  /** Daily event matrix: one row per day, one count column per event
    * type (Spark's relational pivot). `types` is passed EXPLICITLY —
    * `.pivot(col)` without values triggers a separate distinct-scan
    * job to discover the columns, which at 100 TB is a full extra pass;
    * with literal values the whole thing is ONE partial-agg exchange on
    * the (day) key, identical to a manual CASE aggregation.
    * `total` counts only the LISTED types (it is the row-sum of the
    * pivot cells) — events of unlisted types are excluded everywhere.
    * Output: (day, <type...>, total).
    */
  def pivotDaily(events: DataFrame, tsCol: String, typeCol: String,
                 types: Seq[String]): DataFrame =
    events
      .groupBy(to_date(col(tsCol)).as("day"))
      .pivot(typeCol, types)
      .agg(count(lit(1)))
      // pivot emits NULL for day×type cells with no rows — a count is 0.
      .select(col("day") +: types.map(t =>
        coalesce(col(s"`$t`"), lit(0L)).as(t)): _*)
      .withColumn("total", types.map(t => col(s"`$t`")).reduce(_ + _))

  /** DuckDB oracle twin of [[pivotDaily]]: conditional aggregation
    * (what the pivot plans to under the hood).
    */
  def duckPivotDaily(rel: String, tsCol: String, typeCol: String,
                     types: Seq[String]): String = {
    val cells = types.map { t =>
      val l = t.replace("'", "''")
      s"CAST(count(*) FILTER (WHERE $typeCol = '$l') AS BIGINT) AS \"$t\""
    }.mkString(", ")
    val inList = types.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""SELECT CAST($tsCol AS DATE) AS day, $cells,
       |       CAST(count(*) FILTER (WHERE $typeCol IN ($inList)) AS BIGINT) AS total
       |FROM $rel GROUP BY 1""".stripMargin
  }

  /** Per-type AUTOCORRELATION of the daily count series at small lags —
    * the seasonality probe (a strong lag-7 ACF means weekly cycles; a
    * near-1 lag-1 ACF means momentum/trend): Pearson r between the
    * series and its `lag`-day shift, per (event_type, lag).
    *
    * Pair semantics: a (t, t+lag) pair exists iff BOTH days appear in
    * the daily table (days with zero events are absent, not zero —
    * same convention as [[trendFit]]); the pairing is an equi-join on
    * `event_type` and the shifted date, never a window over a densified
    * calendar. Per-type lags with < 2 pairs or zero variance on either
    * side yield NULL.
    *
    * Float parity: daily counts are integers, so all five moments
    * (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT BIGINTs; r is derived with
    * one double quotient num/√(dx·dy) — dx·dy is a product of two
    * exact-in-double integers, √ and ÷ are IEEE-correctly-rounded, so
    * the value is bit-identical cross-engine before round(6).
    *
    * Scale shape: the event stream collapses map-side to (type × day)
    * in one exchange; everything after runs on the tiny daily series
    * (lags exploded → one self-equi-join → one aggregate).
    * Output: (event_type, lag, n_pairs, acf).
    */
  def dailyAcf(events: DataFrame, tsCol: String, typeCol: String,
               maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"dailyAcf: maxLag must be >= 1, got $maxLag")
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    // left side: each day exploded per lag, keyed by its SHIFTED date
    val lags = daily.select(col("event_type"), col("_y").as("_x"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"), col("_d"))
      .select(col("event_type"), col("lag"), col("_x"),
        date_add(col("_d"), col("lag")).as("_d2"))
    val pairs = lags.join(
      daily.select(col("event_type"), col("_d").as("_d2"), col("_y")),
      Seq("event_type", "_d2"))
    val m = pairs.groupBy(col("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
    val dx = col("n_pairs") * col("_sxx") - col("_sx") * col("_sx")
    val dy = col("n_pairs") * col("_syy") - col("_sy") * col("_sy")
    val num = (col("n_pairs") * col("_sxy") - col("_sx") * col("_sy"))
      .cast("double")
    m.select(col("event_type"), col("lag"), col("n_pairs"),
      when(dx > 0L && dy > 0L,
        round(num / sqrt(dx.cast("double") * dy.cast("double")), 6))
        .as("acf"))
  }

  /** Circadian profile per event type — circular statistics over the
    * hour-of-day distribution: the mean resultant length
    *
    *   R = |Σ_h n_h·e^{i·2πh/24}| / n ∈ [0, 1]
    *
    * measures how CONCENTRATED activity is around one time of day
    * (R→1: single rush hour; R→0: uniform or multi-modal) — the
    * seasonality diagnostic a flat hour histogram hides (two opposite
    * peaks also score 0, correctly: there is no single phase).
    *
    * Determinism: cos/sin of the 24 hour angles are µ-QUANTIZED
    * LITERAL TABLES precomputed here and inlined into BOTH engines
    * (the [[Eval.discountMicros]] pattern) — no trig at query time, so
    * no libm divergence; Σ n_h·cos_µ is exact DECIMAL, and R is one
    * √-quotient. The peak hour is the argmax of the integer histogram
    * (ties → earliest hour).
    *
    * Scale shape: one (type, hour) map-side exchange (≤ 24·types
    * rows); everything downstream on that table.
    * Output: (event_type, n, peak_hour, peak_n, resultant).
    */
  def circadianProfile(events: DataFrame, tsCol: String,
                       typeCol: String): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    val cosU = EventStats.hourCosMicros
    val sinU = EventStats.hourSinMicros
    val byHour = events
      .groupBy(col(typeCol).as("event_type"),
        hour(col(tsCol)).cast("int").as("_h"))
      .agg(count(lit(1)).as("_n"))
    val cosT = typedlit(cosU)
    val sinT = typedlit(sinU)
    val agg = byHour.groupBy(col("event_type"))
      .agg(sum(col("_n")).as("n"),
        sum(d38(col("_n")) * d38(element_at(cosT, col("_h") + 1)))
          .as("_c"),
        sum(d38(col("_n")) * d38(element_at(sinT, col("_h") + 1)))
          .as("_s"),
        max(struct(col("_n").as("_pn"), (-col("_h")).as("_nh"))).as("_pk"))
    agg.select(col("event_type"), col("n"),
      (-col("_pk._nh")).cast("long").as("peak_hour"),
      col("_pk._pn").as("peak_n"),
      round(
        sqrt(col("_c").cast("double") * col("_c").cast("double")
          + col("_s").cast("double") * col("_s").cast("double"))
          / col("n").cast("double") / 1.0e6, 6).as("resultant"))
  }

  /** µ-quantized cos/sin tables for the 24 hour angles (1-indexed for
    * element_at/list indexing) — computed ONCE here, inlined into both
    * engines.
    */
  private[graft] val hourCosMicros: Seq[Long] = (0 until 24).map(h =>
    math.round(1.0e6 * math.cos(2.0 * math.Pi * h / 24.0)))
  private[graft] val hourSinMicros: Seq[Long] = (0 until 24).map(h =>
    math.round(1.0e6 * math.sin(2.0 * math.Pi * h / 24.0)))

  /** DuckDB oracle twin of [[circadianProfile]]. The peak tie-break is
    * one integer max_by key — n majors, (23−h) minors, earliest hour
    * wins ties; 24 < 100 so the hour term never outvotes a count step.
    * (Oracle SQL is newline-collapsed by Queries.normalize, so `--`
    * comments are forbidden here.)
    */
  def duckCircadianProfile(rel: String, tsCol: String,
                           typeCol: String): String = {
    val cos = hourCosMicros.mkString("[", ", ", "]")
    val sin = hourSinMicros.mkString("[", ", ", "]")
    s"""WITH byh AS (
       |  SELECT $typeCol AS event_type,
       |         CAST(hour($tsCol) AS INT) AS h,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM $rel GROUP BY 1, 2),
       |agg AS (
       |  SELECT event_type, CAST(sum(n) AS BIGINT) AS n,
       |         sum(CAST(n AS HUGEINT) * ($cos)[h + 1]) AS c,
       |         sum(CAST(n AS HUGEINT) * ($sin)[h + 1]) AS s,
       |         max_by(h, CAST(n AS HUGEINT) * 100 + (23 - h)) AS peak_hour,
       |         max(n) AS peak_n
       |  FROM byh GROUP BY 1)
       |SELECT event_type, n, CAST(peak_hour AS BIGINT) AS peak_hour,
       |       CAST(peak_n AS BIGINT) AS peak_n,
       |       round(sqrt(CAST(c AS DOUBLE) * CAST(c AS DOUBLE)
       |                  + CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
       |             / CAST(n AS DOUBLE) / 1.0e6, 6) AS resultant
       |FROM agg""".stripMargin
  }

  /** Partial autocorrelation (PACF) of the per-type daily series via
    * Durbin–Levinson — the AR-order diagnostic next to [[dailyAcf]]:
    * ACF says "lag-k days correlate", PACF says whether lag k carries
    * signal AFTER lags 1..k−1 are regressed out (the plot an analyst
    * reads to pick an AR(p) order for the volume series).
    *
    * Definitions: the series is the type's PRESENT days in day order
    * (missing days absent — the [[dailyAcf]] convention), indexed by
    * rank; the stationary ACF uses the GLOBAL mean and denominator,
    *   r_k = Σ_{t≤n−k}(x_t−x̄)(x_{t+k}−x̄) / Σ(x_t−x̄)²,
    * expanded to exact DECIMAL integer moments (n²Σxy − nS(H+T) +
    * (n−k)S² over n²Σx² − nS²) with ONE double division per lag; the
    * Durbin–Levinson recursion then runs UNROLLED with left-to-right
    * sum order, mirrored token-for-token in the oracle's CTE ladder,
    * so every double matches bitwise.
    *
    * Scale shape: one (type, day) exchange, then per-type folds over
    * the tiny day array (the [[cusumDaily]] posture). NULL pacf where
    * the recursion is undefined (n ≤ k, zero variance, or a degenerate
    * level denominator).
    *
    * Output: (event_type, lag, acf, pacf) for lag ∈ [1, maxLag].
    */
  def dailyPacf(events: DataFrame, tsCol: String, typeCol: String,
                maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 8, s"dailyPacf: bad maxLag=$maxLag")
    def d38(c: Column) = c.cast("decimal(38,0)")
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("_d").as("_day"),
        col("_y").as("_n")))).as("_s"))
      .select(col("event_type"),
        transform(col("_s"), s => s.getField("_n")).as("_xs"))
      .withColumn("_n", size(col("_xs")).cast("long"))
    def el(i: Column) = element_at(col("_xs"), i.cast("int"))
    def sumRange(lo: Column, hi: Column, f: Column => Column): Column =
      when(hi >= lo,
        aggregate(sequence(lo.cast("int"), hi.cast("int")),
          lit(0L).cast("decimal(38,0)"), (acc, i) => acc + f(i)))
        .otherwise(lit(0L).cast("decimal(38,0)"))
    val n = col("_n")
    val s1 = sumRange(lit(1L), n, i => d38(el(i)))
    val sxx = sumRange(lit(1L), n, i => d38(el(i)) * d38(el(i)))
    val base = series
      .withColumn("_S", s1).withColumn("_sxx", sxx)
      .withColumn("_den",
        (d38(n) * d38(n) * col("_sxx") - d38(n) * col("_S") * col("_S"))
          .cast("double"))
    // exact-moment ACF per lag (NULL when n ≤ k or zero variance)
    val withR = (1 to maxLag).foldLeft(base) { (df, k) =>
      val sxy = sumRange(lit(1L), n - k, i => d38(el(i)) * d38(el(i + k)))
      val h = sumRange(lit(1L), n - k, i => d38(el(i)))
      val t = sumRange(lit(k + 1L), n, i => d38(el(i)))
      df.withColumn(s"_r$k",
        when(n > k && col("_den") > 0.0,
          (d38(n) * d38(n) * sxy - d38(n) * col("_S") * (h + t)
            + d38(n - k) * col("_S") * col("_S")).cast("double")
            / col("_den")))
    }
    // Durbin–Levinson, unrolled: php(level)(j) — left-to-right sums.
    val r = (k: Int) => col(s"_r$k")
    var phi = Map.empty[(Int, Int), Column]
    var out = withR
    for (k <- 1 to maxLag) {
      val pkk =
        if (k == 1) r(1)
        else {
          val num = (1 until k).foldLeft(r(k)) { (acc, j) =>
            acc - phi((k - 1, j)) * r(k - j) }
          val den2 = (1 until k).foldLeft(lit(1.0)) { (acc, j) =>
            acc - phi((k - 1, j)) * r(j) }
          when(den2 =!= 0.0, num / den2)
        }
      out = out.withColumn(s"_p${k}_$k", pkk)
      phi += ((k, k) -> col(s"_p${k}_$k"))
      for (j <- 1 until k) {
        out = out.withColumn(s"_p${k}_$j",
          phi((k - 1, j)) - col(s"_p${k}_$k") * phi((k - 1, k - j)))
        phi += ((k, j) -> col(s"_p${k}_$j"))
      }
    }
    val rows = array((1 to maxLag).map(k => struct(
      lit(k.toLong).as("lag"),
      round(r(k), 6).as("acf"),
      round(phi((k, k)), 6).as("pacf"))): _*)
    out.select(col("event_type"), explode(rows).as("_o"))
      .select(col("event_type"), col("_o.lag"), col("_o.acf"),
        col("_o.pacf"))
  }

  /** DuckDB oracle twin of [[dailyPacf]]: the same exact moments from a
    * rank-offset self-join, the same unrolled recursion as a CTE
    * ladder (one level per lag, identical sum order).
    */
  def duckDailyPacf(rel: String, tsCol: String, typeCol: String,
                    maxLag: Int): String = {
    val rCols = (1 to maxLag).map { k =>
      s"""CASE WHEN n > $k AND den > 0.0 THEN
         |  CAST(n * n * coalesce(sxy$k, 0) - n * s * coalesce(ht$k, 0)
         |       + (n - $k) * s * s AS DOUBLE) / den
         |END AS r$k""".stripMargin
    }.mkString(",\n")
    val momCols = (1 to maxLag).flatMap { k =>
      Seq(
        s"sum(a.y * b.y) FILTER (WHERE b.rk - a.rk = $k) AS sxy$k",
        s"sum(a.y + b.y) FILTER (WHERE b.rk - a.rk = $k) AS ht$k")
    }.mkString(",\n")
    val levels = (1 to maxLag).map { k =>
      val prev = if (k == 1) "rs" else s"lvl${k - 1}"
      def numExpr = (1 until k).foldLeft(s"r$k") { (acc, j) =>
        s"$acc - p${k - 1}_$j * r${k - j}" }
      def denExpr = (1 until k).foldLeft("1.0") { (acc, j) =>
        s"$acc - p${k - 1}_$j * r$j" }
      val pkkExpr =
        if (k == 1) "r1"
        else s"CASE WHEN ($denExpr) <> 0.0 THEN ($numExpr) / ($denExpr) END"
      val pkk = s"$pkkExpr AS p${k}_$k"
      // p{k}_j can't reference its sibling alias p{k}_k in the same
      // SELECT — re-inline the pkk expression (same doubles).
      val pjs = (1 until k).map { j =>
        s"p${k - 1}_$j - ($pkkExpr) * p${k - 1}_${k - j} AS p${k}_$j"
      }
      val cols = (pkk +: pjs).mkString(",\n")
      s"lvl$k AS (SELECT *, $cols FROM $prev)"
    }.mkString(",\n")
    val outRows = (1 to maxLag).map { k =>
      s"""SELECT event_type, CAST($k AS BIGINT) AS lag,
         |  round(r$k, 6) AS acf, round(p${k}_$k, 6) AS pacf
         |FROM lvl$maxLag""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         CAST(count(*) AS BIGINT) AS y
       |  FROM $rel GROUP BY 1, 2),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |         ORDER BY day ASC) AS rk FROM daily),
       |base AS (
       |  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
       |         sum(CAST(y AS HUGEINT)) AS s,
       |         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS sxx
       |  FROM rk GROUP BY 1),
       |mom AS (
       |  SELECT a.event_type,
       |         $momCols
       |  FROM rk a JOIN rk b ON b.event_type = a.event_type
       |        AND b.rk > a.rk AND b.rk - a.rk <= $maxLag
       |  GROUP BY 1),
       |rs AS (
       |  SELECT base.event_type,
       |         $rCols
       |  FROM base LEFT JOIN mom ON mom.event_type = base.event_type
       |  CROSS JOIN LATERAL (SELECT CAST(n * n * sxx - n * s * s AS DOUBLE)
       |                      AS den) d),
       |$levels
       |$outRows""".stripMargin
  }

  /** LEAD-LAG CROSS-CORRELATION between two event types' daily series:
    * Pearson r between count_A(t) and count_B(t + lag) for lag ∈
    * [−maxLag, maxLag] — "do clicks predict purchases, and by how many
    * days?" (the peak-lag reading). Negative lags mean B leads A.
    * Same conventions as [[dailyAcf]]: pairs exist only where both days
    * are present, exact BIGINT moments, one √-quotient, NULL on zero
    * variance. Output: (lag, n_pairs, xcorr).
    */
  def dailyCrossCorr(events: DataFrame, tsCol: String, typeCol: String,
                     typeA: String, typeB: String, maxLag: Int): DataFrame = {
    require(maxLag >= 0, s"dailyCrossCorr: maxLag must be >= 0, got $maxLag")
    def daily(t: String) = events.filter(col(typeCol) === t)
      .groupBy(to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    val lagged = daily(typeA).select(col("_y").as("_x"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"), col("_d"))
      .select(col("lag"), col("_x"), date_add(col("_d"), col("lag")).as("_d2"))
    val pairs = lagged.join(daily(typeB).select(col("_d").as("_d2"), col("_y")),
      Seq("_d2"))
    val m = pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
    val dx = col("n_pairs") * col("_sxx") - col("_sx") * col("_sx")
    val dy = col("n_pairs") * col("_syy") - col("_sy") * col("_sy")
    val num = (col("n_pairs") * col("_sxy") - col("_sx") * col("_sy"))
      .cast("double")
    m.select(col("lag"), col("n_pairs"),
      when(dx > 0L && dy > 0L,
        round(num / sqrt(dx.cast("double") * dy.cast("double")), 6))
        .as("xcorr"))
  }

  /** DuckDB oracle twin of [[dailyCrossCorr]]. */
  def duckDailyCrossCorr(rel: String, tsCol: String, typeCol: String,
                         typeA: String, typeB: String, maxLag: Int): String = {
    def daily(t: String) =
      s"""(SELECT CAST($tsCol AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
         | FROM $rel WHERE $typeCol = '${t.replace("'", "''")}' GROUP BY 1)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT CAST(l.lag AS INTEGER) AS lag, a.y AS x, b.y AS y
       |  FROM ${daily(typeA)} a
       |    CROSS JOIN range(${-maxLag}, ${maxLag + 1}) l(lag)
       |    JOIN ${daily(typeB)} b ON b.d = a.d + CAST(l.lag AS INTEGER)),
       |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
       |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |             CAST(sum(x * y) AS BIGINT) AS sxy,
       |             CAST(sum(x * x) AS BIGINT) AS sxx,
       |             CAST(sum(y * y) AS BIGINT) AS syy
       |      FROM pairs GROUP BY 1)
       |SELECT lag, n_pairs,
       |       CASE WHEN (n_pairs * sxx - sx * sx) > 0
       |                 AND (n_pairs * syy - sy * sy) > 0
       |            THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
       |                       / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
       |                              * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
       |            END AS xcorr
       |FROM m""".stripMargin
  }

  /** DuckDB oracle twin of [[dailyAcf]] — identical integer moments and
    * the same single √-quotient shape.
    */
  def duckDailyAcf(rel: String, tsCol: String, typeCol: String,
                   maxLag: Int): String =
    s"""WITH daily AS (SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS d,
       |                      CAST(count(*) AS BIGINT) AS y
       |               FROM $rel GROUP BY 1, 2),
       |pairs AS (SELECT a.event_type, l.lag, a.y AS x, b.y AS y
       |          FROM daily a CROSS JOIN range(1, ${maxLag + 1}) l(lag)
       |            JOIN daily b ON b.event_type = a.event_type
       |                        AND b.d = a.d + CAST(l.lag AS INTEGER)),
       |m AS (SELECT event_type, CAST(lag AS INTEGER) AS lag,
       |             CAST(count(*) AS BIGINT) AS n_pairs,
       |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |             CAST(sum(x * y) AS BIGINT) AS sxy,
       |             CAST(sum(x * x) AS BIGINT) AS sxx,
       |             CAST(sum(y * y) AS BIGINT) AS syy
       |      FROM pairs GROUP BY 1, 2)
       |SELECT event_type, lag, n_pairs,
       |       CASE WHEN (n_pairs * sxx - sx * sx) > 0
       |                 AND (n_pairs * syy - sy * sy) > 0
       |            THEN round(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
       |                       / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)
       |                              * CAST(n_pairs * syy - sy * sy AS DOUBLE)), 6)
       |            END AS acf
       |FROM m""".stripMargin

  /** Per-type LINEAR TREND over the daily count series — ordinary least
    * squares of daily volume on the day index, the "is this event type
    * growing or dying" monitor (and, over corpus ingest dates, the
    * "which sources are ramping" curation signal). Reported per type:
    * the slope (events/day) and intercept of the fitted line.
    *
    * Scale shape: the event stream collapses map-side to (day × type)
    * in one exchange; the OLS moments (Σx, Σy, Σxy, Σx²) are one more
    * aggregate over that tiny daily series. No window, no sort.
    *
    * Float parity: x is the integer day offset from the GLOBAL first
    * day (one broadcast 1-row probe), y an integer count — all four
    * moments are EXACT BIGINTs, so slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²)
    * and the intercept are each ONE fixed double expression over
    * integers, bit-identical cross-engine; round(6) seals them. Types
    * seen on a single day have a zero denominator → NULL slope.
    * Output: (event_type, n_days, slope, intercept).
    */
  def trendFit(events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    val d0 = daily.agg(min(col("_d")).as("_d0"))
    val m = daily.crossJoin(broadcast(d0))
      .select(col("event_type"),
        datediff(col("_d"), col("_d0")).cast("long").as("_x"), col("_y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
    val num = (col("n_days") * col("_sxy") - col("_sx") * col("_sy"))
    val den = (col("n_days") * col("_sxx") - col("_sx") * col("_sx"))
    val slope = num.cast("double") / den.cast("double")
    m.select(col("event_type"), col("n_days"),
      when(den =!= 0L, round(slope, 6)).as("slope"),
      when(den =!= 0L,
        round((col("_sy").cast("double") - slope * col("_sx").cast("double"))
          / col("n_days").cast("double"), 6)).as("intercept"))
  }

  /** DuckDB oracle twin of [[trendFit]] — identical integer moments and
    * double expression shapes.
    */
  def duckTrendFit(rel: String, tsCol: String, typeCol: String): String =
    s"""WITH daily AS (SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS d,
       |                      count(*) AS y
       |               FROM $rel GROUP BY 1, 2),
       |d0 AS (SELECT min(d) AS d0 FROM daily),
       |m AS (SELECT event_type, count(*) AS n_days,
       |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |             CAST(sum(x * y) AS BIGINT) AS sxy,
       |             CAST(sum(x * x) AS BIGINT) AS sxx
       |      FROM (SELECT event_type, CAST(date_diff('day', d0, d) AS BIGINT) AS x, y
       |            FROM daily, d0)
       |      GROUP BY 1)
       |SELECT event_type, n_days,
       |       CASE WHEN (n_days * sxx - sx * sx) <> 0
       |            THEN round(CAST(n_days * sxy - sx * sy AS DOUBLE)
       |                       / CAST(n_days * sxx - sx * sx AS DOUBLE), 6)
       |            END AS slope,
       |       CASE WHEN (n_days * sxx - sx * sx) <> 0
       |            THEN round((CAST(sy AS DOUBLE)
       |                        - (CAST(n_days * sxy - sx * sy AS DOUBLE)
       |                           / CAST(n_days * sxx - sx * sx AS DOUBLE))
       |                          * CAST(sx AS DOUBLE))
       |                       / CAST(n_days AS DOUBLE), 6)
       |            END AS intercept
       |FROM m""".stripMargin

  /** EWMA (exponentially-weighted moving average) smoothing of the
    * daily count series per event type — the standard monitoring
    * baseline next to [[anomalyZscores]]' trailing windows: reacts to
    * level shifts with exponential memory instead of a hard cutoff.
    * `y_t = α·x_t + (1−α)·y_{t−1}`, seeded with the first day's count.
    *
    * Scale shape: the stream collapses map-side to (day × type) in one
    * exchange; the recurrence — inherently sequential — folds over
    * each type's DAY SERIES (tiny by construction), never over events:
    * a sorted per-type array fold, the [[graft.operators.Packing]]
    * binPack pattern.
    *
    * Float parity: both engines fold the identical (day ASC) order
    * with the same double expression; only the OUTPUT is rounded —
    * state keeps full precision, so the recurrence never diverges.
    * Output: (event_type, day, n, ewma).
    */
  def ewmaDaily(events: DataFrame, tsCol: String, typeCol: String,
                alpha: Double): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("_d").as("_day"),
        col("_y").as("_n")))).as("_s"))
    val init = struct(lit(Double.NaN).as("prev"),
      array().cast("array<double>").as("out"))
    val folded = series.withColumn("_st",
      aggregate(col("_s"), init, (s, e) => {
        val x = e.getField("_n").cast("double")
        val y = when(isnan(s.getField("prev")), x)
          .otherwise(lit(alpha) * x + lit(1.0 - alpha) * s.getField("prev"))
        struct(y.as("prev"), concat(s.getField("out"), array(y)).as("out"))
      }))
    folded
      .select(col("event_type"),
        explode(arrays_zip(col("_s"), col("_st.out"))).as("_z"))
      .select(col("event_type"), col("_z._s._day").as("day"),
        col("_z._s._n").as("n"), round(col("_z.out"), 6).as("ewma"))
  }

  /** One-sided CUSUM change-point monitor over the per-type daily
    * series: s_t = max(0, s_{t−1} + (x_t − μ − k)), flag when s_t > h —
    * the standard "has the daily volume drifted above its mean"
    * sequential test (Page 1954), next to [[anomalyZscores]]'s
    * pointwise trailing z-score: CUSUM accumulates SMALL persistent
    * shifts a per-day z-score never trips on.
    *
    * FIXED-POINT INTEGER state (the PageRank posture): counts scale to
    * micro-units, μ = (Σx·10⁶) div n, and the whole recurrence is
    * BIGINT — bit-reproducible, oracle-hash-exact; `kMicro`/`hMicro`
    * are the slack and alarm threshold in the same micro-units.
    * Missing days are ABSENT (the [[dailyAcf]] convention): the fold
    * runs over present days only.
    *
    * Scale shape: one (type, day) map-side exchange; the sequential
    * fold runs per type over its tiny day series (the [[ewmaDaily]]
    * fold pattern). Output: (event_type, day, n, cusum, flagged).
    */
  def cusumDaily(events: DataFrame, tsCol: String, typeCol: String,
                 kMicro: Long, hMicro: Long): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("_d").as("_day"),
          col("_y").as("_n")))).as("_s"),
        sum(col("_y")).as("_sum"), count(lit(1)).as("_nd"))
      .withColumn("_mu", expr("(_sum * 1000000L) div _nd"))
    val init = struct(lit(0L).as("prev"),
      array().cast("array<bigint>").as("out"))
    val folded = series.withColumn("_st",
      aggregate(col("_s"), init, (s, e) => {
        val v = greatest(lit(0L),
          s.getField("prev") + e.getField("_n") * lit(1000000L)
            - col("_mu") - lit(kMicro))
        struct(v.as("prev"), concat(s.getField("out"), array(v)).as("out"))
      }))
    folded
      .select(col("event_type"),
        explode(arrays_zip(col("_s"), col("_st.out"))).as("_z"))
      .select(col("event_type"), col("_z._s._day").as("day"),
        col("_z._s._n").as("n"),
        round(col("_z.out").cast("double") / 1e6, 6).as("cusum"),
        (col("_z.out") > hMicro).as("flagged"))
  }

  /** DuckDB oracle twin of [[cusumDaily]] — the integer recurrence as a
    * recursive CTE over each type's day rank.
    */
  def duckCusumDaily(rel: String, tsCol: String, typeCol: String,
                     kMicro: Long, hMicro: Long): String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM $rel GROUP BY 1, 2),
       |mu AS (SELECT event_type,
       |              (CAST(sum(n) AS BIGINT) * 1000000) // count(*) AS mu
       |       FROM daily GROUP BY 1),
       |r AS (SELECT d.*, mu.mu, row_number() OVER (PARTITION BY d.event_type
       |        ORDER BY d.day ASC) AS rk
       |      FROM daily d JOIN mu ON mu.event_type = d.event_type),
       |f AS (
       |  SELECT event_type, day, n, mu, rk,
       |         greatest(CAST(0 AS BIGINT),
       |                  CAST(n * 1000000 - mu - $kMicro AS BIGINT)) AS s
       |  FROM r WHERE rk = 1
       |  UNION ALL
       |  SELECT r.event_type, r.day, r.n, r.mu, r.rk,
       |         greatest(CAST(0 AS BIGINT),
       |                  CAST(f.s + r.n * 1000000 - r.mu - $kMicro AS BIGINT))
       |  FROM r JOIN f ON r.event_type = f.event_type AND r.rk = f.rk + 1)
       |SELECT event_type, day, n,
       |       round(CAST(s AS DOUBLE) / 1e6, 6) AS cusum,
       |       s > $hMicro AS flagged
       |FROM f""".stripMargin

  /** DuckDB oracle twin of [[ewmaDaily]] — the recurrence restated as
    * a recursive CTE over each type's day rank.
    */
  def duckEwmaDaily(rel: String, tsCol: String, typeCol: String,
                    alpha: Double): String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         count(*) AS n
       |  FROM $rel GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |        ORDER BY day ASC) AS rk FROM daily),
       |f AS (
       |  SELECT event_type, day, n, rk, CAST(n AS DOUBLE) AS ewma
       |  FROM r WHERE rk = 1
       |  UNION ALL
       |  SELECT r.event_type, r.day, r.n, r.rk,
       |         $alpha * CAST(r.n AS DOUBLE) + ${1.0 - alpha} * f.ewma
       |  FROM f JOIN r ON r.event_type = f.event_type AND r.rk = f.rk + 1)
       |SELECT event_type, day, CAST(n AS BIGINT) AS n,
       |       round(ewma, 6) AS ewma
       |FROM f""".stripMargin

  /** Holt double-exponential smoothing over the per-type daily series —
    * the FORECASTING member next to [[ewmaDaily]] (which tracks level
    * only and lags every trend): level and trend co-evolve,
    *
    *   l_t = α·x_t + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *
    * seeded l_1 = x_1, b_1 = 0; the one-step-ahead forecast from day t
    * is l_t + b_t — the "what should tomorrow's volume be" line that
    * capacity alerts compare against.
    *
    * Cross-engine determinism: the recurrence is a LEFT FOLD over each
    * type's day-sorted series with the identical double operation
    * order in the oracle's recursive CTE (the [[ewmaDaily]] posture);
    * missing days are ABSENT, not zero-filled.
    *
    * Scale shape: one (type, day) map-side exchange, then a per-type
    * fold over its tiny day series.
    * Output: (event_type, day, n, level, trend, forecast).
    */
  def holtDaily(events: DataFrame, tsCol: String, typeCol: String,
                alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"holtDaily: bad alpha=$alpha / beta=$beta")
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1)).as("_y"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("_d").as("_day"),
        col("_y").as("_n")))).as("_s"))
    val init = struct(lit(Double.NaN).as("pl"), lit(0.0).as("pb"),
      array().cast("array<struct<l:double,b:double>>").as("out"))
    val folded = series.withColumn("_st",
      aggregate(col("_s"), init, (s, e) => {
        val x = e.getField("_n").cast("double")
        val first = isnan(s.getField("pl"))
        val l = when(first, x)
          .otherwise(lit(alpha) * x
            + lit(1.0 - alpha) * (s.getField("pl") + s.getField("pb")))
        val b = when(first, lit(0.0))
          .otherwise(lit(beta) * (l - s.getField("pl"))
            + lit(1.0 - beta) * s.getField("pb"))
        struct(l.as("pl"), b.as("pb"),
          concat(s.getField("out"),
            array(struct(l.as("l"), b.as("b")))).as("out"))
      }))
    folded
      .select(col("event_type"),
        explode(arrays_zip(col("_s"), col("_st.out"))).as("_z"))
      .select(col("event_type"), col("_z._s._day").as("day"),
        col("_z._s._n").as("n"),
        round(col("_z.out.l"), 6).as("level"),
        round(col("_z.out.b"), 6).as("trend"),
        // forecast from the ROUNDED level/trend: the raw l+b can land
        // exactly on a 0.5e-6 boundary where the two engines' round()
        // disagree by 1 ulp; a sum of two 6-dp values never does.
        round(round(col("_z.out.l"), 6) + round(col("_z.out.b"), 6), 6)
          .as("forecast"))
  }

  /** DuckDB oracle twin of [[holtDaily]] — the identical double
    * recurrence as a recursive CTE over each type's day rank (the new
    * level expression is inlined into the trend update so both engines
    * evaluate the same operations in the same order).
    */
  def duckHoltDaily(rel: String, tsCol: String, typeCol: String,
                    alpha: Double, beta: Double): String = {
    val lNew = s"$alpha * CAST(r.n AS DOUBLE) + ${1.0 - alpha} * (f.l + f.b)"
    s"""WITH RECURSIVE daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         count(*) AS n
       |  FROM $rel GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
       |        ORDER BY day ASC) AS rk FROM daily),
       |f AS (
       |  SELECT event_type, day, n, rk,
       |         CAST(n AS DOUBLE) AS l, CAST(0.0 AS DOUBLE) AS b
       |  FROM r WHERE rk = 1
       |  UNION ALL
       |  SELECT r.event_type, r.day, r.n, r.rk,
       |         $lNew,
       |         $beta * (($lNew) - f.l) + ${1.0 - beta} * f.b
       |  FROM f JOIN r ON r.event_type = f.event_type AND r.rk = f.rk + 1)
       |SELECT event_type, day, CAST(n AS BIGINT) AS n,
       |       round(l, 6) AS level, round(b, 6) AS trend,
       |       round(round(l, 6) + round(b, 6), 6) AS forecast
       |FROM f""".stripMargin
  }

  /** FIRST-ORDER TRANSITION MATRIX over per-user event sequences: for
    * each ordered pair of event types, how often does `from` lead
    * directly to `to`, and with what conditional probability — the
    * Markov-chain view of user behavior (drop-off analysis, anomalous
    * flow detection) and, over document-processing event logs, the
    * pipeline-stage flow monitor.
    *
    * Scale shape: ONE user-keyed exchange for the `lead` window (the
    * sequence is the per-user order — this exchange is irreducible),
    * then everything collapses to |types|²-sized aggregates; the
    * probability normalizer joins back by broadcast.
    *
    * Determinism: sequence order is (ts, tieBreakCol) — same-timestamp
    * events are ordered by the tie-break on both engines; counts are
    * integers, the probability is one division, round(6).
    * Output: (from_type, to_type, n, p).
    */
  def transitions(events: DataFrame, tsCol: String, typeCol: String,
                  userCol: String, tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieBreakCol).asc)
    val pairs = events
      .select(col(userCol), col(tsCol), col(tieBreakCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val cnt = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("from_type")).agg(sum(col("n")).as("_t"))
    cnt.join(broadcast(tot), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_t").cast("double"), 6).as("p"))
  }

  /** DuckDB oracle twin of [[transitions]]. */
  def duckTransitions(rel: String, tsCol: String, typeCol: String,
                      userCol: String, tieBreakCol: String): String =
    s"""WITH p AS (SELECT $typeCol AS from_type,
       |                  lead($typeCol) OVER (PARTITION BY $userCol
       |                    ORDER BY $tsCol ASC, $tieBreakCol ASC) AS to_type
       |           FROM $rel),
       |c AS (SELECT from_type, to_type, count(*) AS n FROM p
       |      WHERE to_type IS NOT NULL GROUP BY 1, 2),
       |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tt FROM c GROUP BY 1)
       |SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       |       round(CAST(c.n AS DOUBLE) / CAST(t.tt AS DOUBLE), 6) AS p
       |FROM c JOIN t USING (from_type)""".stripMargin

  /** Trailing-window anomaly z-scores over the daily count series of
    * each event type: each day scored against the mean/stddev of the
    * PRECEDING `win` days (current day excluded — today must not dilute
    * its own baseline). Only days with a full trailing window are
    * emitted (partial baselines produce garbage z-scores).
    *
    * Scale shape: the raw stream reduces map-side to (day × type)
    * cardinality in one exchange; the windows run over that tiny daily
    * series (one more exchange at type cardinality). Nothing
    * event-sized ever sorts.
    *
    * Float parity: daily counts are integers, so Σc and Σc² are EXACT
    * BIGINTs; mean/variance come from those two sums in one fixed
    * expression (sample variance, n−1), so both engines compute
    * bit-identical doubles. round(6) seals the output.
    * Output: (event_type, day, n, z).
    */
  def anomalyZscores(events: DataFrame, tsCol: String, typeCol: String,
                     win: Int = 7): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-win, -1)
    // Window expressions are materialized as columns BEFORE the filter
    // (a window function may not appear inside WHERE), and mean/variance
    // derive from the two exact integer sums in one fixed expression.
    val scored = daily
      .withColumn("_wn", count(col("n")).over(w))
      .withColumn("_s1", sum(col("n")).over(w).cast("double"))
      .withColumn("_s2", sum(col("n") * col("n")).over(w).cast("double"))
    val mean = col("_s1") / win
    val variance = (col("_s2") - col("_s1") * col("_s1") / win) / (win - 1)
    scored
      .filter(col("_wn") === win && sqrt(variance) > 0.0)
      .select(col("event_type"), col("day"), col("n"),
        round((col("n").cast("double") - mean) / sqrt(variance), 6).as("z"))
  }

  /** DuckDB oracle twin of [[anomalyZscores]] — same two exact integer
    * sums, same expression shape.
    */
  def duckAnomalyZscores(rel: String, tsCol: String, typeCol: String,
                         win: Int = 7): String =
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         count(*) AS n
       |  FROM $rel GROUP BY 1, 2),
       |scored AS (
       |  SELECT event_type, day, n,
       |    count(n) OVER w AS wn,
       |    CAST(sum(n) OVER w AS DOUBLE) AS s1,
       |    CAST(sum(n * n) OVER w AS DOUBLE) AS s2
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day
       |               ROWS BETWEEN $win PRECEDING AND 1 PRECEDING))
       |SELECT event_type, day, n,
       |       round((CAST(n AS DOUBLE) - s1 / $win) /
       |             sqrt((s2 - s1 * s1 / $win) / ${win - 1}), 6) AS z
       |FROM scored
       |WHERE wn = $win AND sqrt((s2 - s1 * s1 / $win) / ${win - 1}) > 0.0""".stripMargin

  /** THEIL–SEN robust trend slope per event type — the median of all
    * pairwise day-to-day slopes of the daily count series. One wild day
    * corrupts the least-squares [[trendFit]] slope; it moves the
    * pairwise-slope MEDIAN almost not at all (29% breakdown point).
    *
    * Scale shape: the event stream reduces to (day × type) in ONE
    * corpus exchange; the pairwise self-join and the exact median run
    * over the days-sized series only (pairs = O(days²) per type —
    * metadata scale for any corpus: ten years is ~6.7M pairs).
    *
    * Float parity: each slope is ONE division of exact integers —
    * identical doubles in both engines — and the interpolated median
    * of identical multisets is identical. round(6) seals the output.
    * Output: (event_type, n_days, n_pairs, sen_slope).
    */
  def theilSen(events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val pairs = daily.as("x").join(daily.as("y"),
        col("x.event_type") === col("y.event_type") &&
          col("x.day") < col("y.day"))
      .select(col("x.event_type").as("event_type"),
        ((col("y.n") - col("x.n")).cast("double") /
          datediff(col("y.day"), col("x.day")).cast("double")).as("slope"))
    val nDays = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"))
    pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        round(percentile(col("slope"), lit(0.5)), 6).as("sen_slope"))
      .join(nDays, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("sen_slope"))
  }

  /** DuckDB oracle twin of [[theilSen]]. */
  def duckTheilSen(rel: String, tsCol: String, typeCol: String): String =
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         count(*) AS n
       |  FROM $rel GROUP BY 1, 2),
       |pairs AS (
       |  SELECT x.event_type,
       |         CAST(y.n - x.n AS DOUBLE)
       |           / CAST(datediff('day', x.day, y.day) AS DOUBLE) AS slope
       |  FROM daily x JOIN daily y
       |    ON x.event_type = y.event_type AND x.day < y.day),
       |nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
       |       FROM daily GROUP BY 1)
       |SELECT p.event_type, nd.n_days,
       |       CAST(count(*) AS BIGINT) AS n_pairs,
       |       round(quantile_cont(p.slope, 0.5), 6) AS sen_slope
       |FROM pairs p JOIN nd ON nd.event_type = p.event_type
       |GROUP BY 1, 2""".stripMargin

  /** WEEKLY SEASONALITY strength per event type — variance
    * decomposition of the daily count series over day-of-week groups:
    *
    *   strength = SS_between / SS_total
    *            = (Σ_d S_d²/n_d − S²/N) / (Σ n² − S²/N)
    *
    * 1.0 ⇒ the weekday fully determines the volume; 0 ⇒ no weekly
    * pattern. `peak_dow` is the argmax of the per-dow mean (0 = Sunday,
    * ties → earliest day).
    *
    * Scale shape: the event stream reduces map-side to (day × type)
    * in ONE corpus exchange; everything after is a type-cardinality
    * aggregate with SEVEN fixed conditional sums — the cross-dow
    * reductions are left-associated 7-term column chains, not a
    * float-order-dependent groupBy, so both engines fold identical
    * doubles in identical order. Integer moments are exact BIGINTs
    * (envelope: per-type daily counts < 2^26·√days keep Σn² inside
    * 2^63; S_d < 2^53 keeps its double conversion exact — comfortably
    * 10⁹ events/day/type).
    * Output: (event_type, n_days, peak_dow, strength) — strength NULL
    * for a constant series (zero total variance).
    */
  def weeklySeasonality(events: DataFrame, tsCol: String,
                        typeCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("int"))
    val dows = 0 to 6
    val aggs = Seq(
      count(lit(1)).as("N"),
      sum(col("n")).as("S"),
      sum(col("n") * col("n")).as("SSx")) ++
      dows.flatMap(d => Seq(
        coalesce(sum(when(col("dow") === d, col("n"))), lit(0L)).as(s"s$d"),
        count(when(col("dow") === d, lit(1))).as(s"c$d")))
    val m = daily.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
    def dbl(c: String) = col(c).cast("double")
    val sb = dows.map(d =>
        when(col(s"c$d") > 0, dbl(s"s$d") * dbl(s"s$d") / dbl(s"c$d"))
          .otherwise(lit(0.0)))
      .reduceLeft(_ + _)
    val s2n = dbl("S") * dbl("S") / dbl("N")
    val st = dbl("SSx")
    // peak: strict > keeps the EARLIEST dow on mean ties; absent dows
    // score -1 (means are ≥ 0) so they can never win.
    val means = dows.map(d =>
      when(col(s"c$d") > 0, dbl(s"s$d") / dbl(s"c$d")).otherwise(lit(-1.0)))
    val peak = dows.tail.foldLeft((means.head, lit(0).cast("int"))) {
      case ((bestM, bestD), d) =>
        (when(means(d) > bestM, means(d)).otherwise(bestM),
          when(means(d) > bestM, lit(d).cast("int")).otherwise(bestD))
    }._2
    m.select(
      col("event_type"), col("N").as("n_days"), peak.as("peak_dow"),
      when(st - s2n > 0.0, round((sb - s2n) / (st - s2n), 6)).as("strength"))
  }

  /** DuckDB oracle twin of [[weeklySeasonality]] — same 7-column
    * conditional sums, same left-associated double chains (DuckDB
    * dayofweek is already 0 = Sunday).
    */
  def duckWeeklySeasonality(rel: String, tsCol: String,
                            typeCol: String): String = {
    val dows = 0 to 6
    val sums = dows.map(d =>
      s"""CAST(coalesce(sum(n) FILTER (WHERE dow = $d), 0) AS BIGINT) AS s$d,
         |  CAST(count(*) FILTER (WHERE dow = $d) AS BIGINT) AS c$d""".stripMargin)
      .mkString(",\n  ")
    val sb = dows.map(d =>
      s"CASE WHEN c$d > 0 THEN CAST(s$d AS DOUBLE) * CAST(s$d AS DOUBLE) " +
        s"/ CAST(c$d AS DOUBLE) ELSE 0.0 END")
      .mkString("(", " + ", ")")
    val s2n = "CAST(S AS DOUBLE) * CAST(S AS DOUBLE) / CAST(N AS DOUBLE)"
    def mean(d: Int) =
      s"CASE WHEN c$d > 0 THEN CAST(s$d AS DOUBLE) / CAST(c$d AS DOUBLE) ELSE -1.0 END"
    // The same strict-> fold, rendered as one nested-CASE chain per level.
    val peak = dows.tail.foldLeft((mean(0), "0")) { case ((bestM, bestD), d) =>
      (s"CASE WHEN ${mean(d)} > ($bestM) THEN ${mean(d)} ELSE ($bestM) END",
        s"CASE WHEN ${mean(d)} > ($bestM) THEN $d ELSE ($bestD) END")
    }._2
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         count(*) AS n
       |  FROM $rel GROUP BY 1, 2),
       |dw AS (SELECT event_type, dayofweek(day) AS dow, n FROM daily),
       |m AS (
       |  SELECT event_type,
       |  CAST(count(*) AS BIGINT) AS N,
       |  CAST(sum(n) AS BIGINT) AS S,
       |  CAST(sum(n * n) AS BIGINT) AS SSx,
       |  $sums
       |  FROM dw GROUP BY 1)
       |SELECT event_type, N AS n_days,
       |       CAST(($peak) AS INTEGER) AS peak_dow,
       |       CASE WHEN CAST(SSx AS DOUBLE) - $s2n > 0.0
       |            THEN round(($sb - $s2n) / (CAST(SSx AS DOUBLE) - $s2n), 6)
       |       END AS strength
       |FROM m""".stripMargin
  }

  /** ROBUST (median/MAD) outlier summary over each type's daily count
    * series — the heavy-tail-safe twin of [[anomalyZscores]]: one wild
    * day inflates a mean/stddev baseline and masks itself, but barely
    * moves the median and the median-absolute-deviation. A day is an
    * outlier when |n − median| > 3 · 1.4826 · MAD (1.4826 scales MAD to
    * σ under normality — the standard consistency constant).
    *
    * Scale shape: the event stream reduces map-side to (day × type)
    * daily counts in ONE corpus exchange; the exact medians are
    * holistic window aggregates over that daily series only — state is
    * days-per-type (bounded: ~365·years rows), never event-sized.
    *
    * Float parity: daily counts are BIGINTs; an exact interpolated
    * median of integers is a multiple of 0.5 and a MAD of those a
    * multiple of 0.25 — all exactly representable, so the threshold
    * compare `dev > 3.0 * 1.4826 * mad` is bit-deterministic in both
    * engines (same literals, same IEEE ops). round(6) seals outputs.
    * Output: (event_type, n_days, med, mad, n_outliers).
    */
  def madOutliers(events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("_med", percentile(col("n"), lit(0.5)).over(w))
      .withColumn("_dev", abs(col("n").cast("double") - col("_med")))
      .withColumn("_mad", percentile(col("_dev"), lit(0.5)).over(w))
    scored.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        round(min(col("_med")), 6).as("med"),
        round(min(col("_mad")), 6).as("mad"),
        count(when(col("_dev") > lit(3.0) * lit(1.4826) * col("_mad"), lit(1)))
          .as("n_outliers"))
  }

  /** DuckDB oracle twin of [[madOutliers]] — same exact interpolated
    * medians (quantile_cont ≡ percentile), same threshold expression.
    */
  def duckMadOutliers(rel: String, tsCol: String, typeCol: String): String =
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS day,
       |         count(*) AS n
       |  FROM $rel GROUP BY 1, 2),
       |med AS (
       |  SELECT event_type, quantile_cont(n, 0.5) AS med
       |  FROM daily GROUP BY 1),
       |dev AS (
       |  SELECT d.event_type, abs(CAST(d.n AS DOUBLE) - m.med) AS dev, m.med
       |  FROM daily d JOIN med m USING (event_type)),
       |mad AS (
       |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
       |  FROM dev GROUP BY 1)
       |SELECT d.event_type,
       |       CAST(count(*) AS BIGINT) AS n_days,
       |       round(min(d.med), 6) AS med,
       |       round(min(a.mad), 6) AS mad,
       |       CAST(count(*) FILTER (WHERE d.dev > 3.0 * 1.4826 * a.mad)
       |            AS BIGINT) AS n_outliers
       |FROM dev d JOIN mad a USING (event_type)
       |GROUP BY 1""".stripMargin

  /** Semi-structured property extraction: parse the JSON `propsCol`
    * with a declared schema (`from_json` — schema'd, codegen'd, no
    * UDF) and aggregate the extracted field per event type. A real
    * pipeline points this at arbitrarily nested payloads; the operator
    * shape (schema-on-read projection → agg) is identical.
    * Output: (event_type, n_events, n_with_k, sum_k, min_k, max_k, avg_k).
    */
  def jsonPropStats(events: DataFrame, propsCol: String,
                    typeCol: String): DataFrame =
    events
      .withColumn("_k", from_json(col(propsCol), StructType.fromDDL("k BIGINT")).getField("k"))
      .groupBy(col(typeCol).as("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("_k")).as("n_with_k"),
        sum(col("_k")).as("sum_k"),
        min(col("_k")).as("min_k"),
        max(col("_k")).as("max_k"),
        round(sum(col("_k")).cast("double") / count(col("_k")).cast("double"), 6)
          .as("avg_k"))

  /** DuckDB oracle twin of [[jsonPropStats]]. The fixture payloads are
    * FLAT single-key objects (`{"k": <int>}`), so a regex extract
    * reproduces the schema'd parse exactly (keeps the oracle
    * independent of DuckDB's JSON extension). The value group must be
    * terminated by `,`/`}`/whitespace so a float payload (`"k": 5.5`)
    * yields NULL here just as `from_json` with `k BIGINT` does —
    * nested `"k"` keys would still diverge, hence the flat-fixture
    * constraint (asserted in EventStatsSpec).
    */
  def duckJsonPropStats(rel: String, propsCol: String,
                        typeCol: String): String =
    s"""WITH p AS (
       |  SELECT $typeCol,
       |         CAST(nullif(regexp_extract($propsCol,
       |           '"k"\\s*:\\s*(-?[0-9]+)\\s*[,}]', 1), '') AS BIGINT) AS k
       |  FROM $rel)
       |SELECT $typeCol AS event_type, count(*) AS n_events,
       |       count(k) AS n_with_k,
       |       CAST(sum(k) AS BIGINT) AS sum_k,
       |       min(k) AS min_k, max(k) AS max_k,
       |       round(CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE), 6) AS avg_k
       |FROM p GROUP BY 1""".stripMargin

  /** Exact per-group trimmed and winsorized means — the robust location
    * estimates a heavy-tailed metric needs next to [[madOutliers]]'s
    * dispersion view: trim drops the lowest/highest `trimPct`% of rows,
    * winsorize CLAMPS them to the cut values instead.
    *
    * Entirely integer arithmetic on the per-(group, distinct-µ-value)
    * count table: with cumulative row ranges [cb, cb+c) per value and
    * tl = ⌊n·trimPct/100⌋ rows trimmed per side, each value contributes
    * `overlap([cb, cb+c), [tl, n−tl))` rows to the trimmed sum — exact
    * partial inclusion at the cut boundaries, no float rank
    * interpolation, identical in both engines. The winsorized sum adds
    * tl copies of each cut value. ONE final double division per mean.
    *
    * Scale shape: one map-side-combinable (group, value) aggregate;
    * the cumulative window runs per group over its distinct values
    * only (the [[Eval.aucRankSum]] discipline).
    *
    * Output: (groupCol, n, trim_n, lo_cut, hi_cut, mean, trimmed_mean,
    * winsorized_mean) — robust means NULL when the trim empties the
    * middle (n ≤ 2·tl).
    */
  def trimmedStats(df: DataFrame, groupCol: String, valueCol: String,
                   trimPct: Int): DataFrame = {
    require(trimPct >= 0 && trimPct < 50, s"trimPct=$trimPct out of [0,50)")
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val micro = round(col(valueCol) * lit(1000000.0)).cast("long")
    val byVal = df
      .groupBy(col(groupCol).as("g"), micro.as("_m"))
      .agg(count(lit(1)).as("_c"))
    val before = Window.partitionBy(col("g")).orderBy(col("_m"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = byVal
      .withColumn("_cb", coalesce(sum(col("_c")).over(before), lit(0L)))
    val agg = cum
      .groupBy(col("g"))
      .agg(sum(col("_c")).as("n"), sum(d38(col("_m")) * d38(col("_c"))).as("_s"),
        // deferred: per-value overlap with the kept rank range needs n,
        // so collect the tiny (value, count, cumBefore) triple list and
        // fold — distinct-values-sized per group, the days-series
        // pattern.
        sort_array(collect_list(struct(col("_m"), col("_c"), col("_cb"))))
          .as("_l"))
      .withColumn("_tl", expr(s"(n * $trimPct) div 100"))
    val kept = (s: org.apache.spark.sql.Column) => {
      val lo = greatest(s.getField("_cb"), col("_tl"))
      val hi = least(s.getField("_cb") + s.getField("_c"), col("n") - col("_tl"))
      greatest(hi - lo, lit(0L))
    }
    val folded = agg
      .withColumn("_ts", aggregate(col("_l"), lit(0L).cast("decimal(38,0)"),
        (acc, s) => acc + d38(s.getField("_m")) * d38(kept(s))))
      .withColumn("_lo", aggregate(col("_l"), lit(null).cast("long"),
        (acc, s) => coalesce(acc,
          when(s.getField("_cb") + s.getField("_c") > col("_tl"),
            s.getField("_m")))))
      .withColumn("_hi", aggregate(col("_l"), lit(null).cast("long"),
        (acc, s) => coalesce(
          when(s.getField("_cb") < col("n") - col("_tl"), s.getField("_m")),
          acc)))
    val trimN = col("n") - lit(2L) * col("_tl")
    val ok = trimN > 0
    folded.select(
      col("g").as(groupCol), col("n"), trimN.as("trim_n"),
      when(ok, round(col("_lo").cast("double") / 1e6, 6)).as("lo_cut"),
      when(ok, round(col("_hi").cast("double") / 1e6, 6)).as("hi_cut"),
      round(col("_s").cast("double") / col("n").cast("double") / 1e6, 6)
        .as("mean"),
      when(ok, round(col("_ts").cast("double") / trimN.cast("double") / 1e6, 6))
        .as("trimmed_mean"),
      when(ok, round(
        (col("_ts").cast("double")
          + col("_tl").cast("double") * col("_lo").cast("double")
          + col("_tl").cast("double") * col("_hi").cast("double"))
          / col("n").cast("double") / 1e6, 6)).as("winsorized_mean"))
  }

  /** DuckDB oracle twin of [[trimmedStats]]. */
  def duckTrimmedStats(rel: String, groupCol: String, valueCol: String,
                       trimPct: Int): String =
    s"""WITH byval AS (
       |  SELECT $groupCol AS g, CAST(round($valueCol * 1000000.0) AS BIGINT) AS m,
       |         CAST(count(*) AS BIGINT) AS c
       |  FROM $rel GROUP BY 1, 2),
       |cum AS (
       |  SELECT g, m, c,
       |         coalesce(sum(c) OVER (PARTITION BY g ORDER BY m
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb,
       |         sum(c) OVER (PARTITION BY g) AS n
       |  FROM byval),
       |t AS (SELECT *, (n * $trimPct) // 100 AS tl,
       |             greatest(least(cb + c, n - (n * $trimPct) // 100)
       |                      - greatest(cb, (n * $trimPct) // 100), 0) AS kc
       |      FROM cum),
       |agg AS (
       |  SELECT g, CAST(max(n) AS BIGINT) AS n, CAST(max(tl) AS BIGINT) AS tl,
       |         sum(CAST(m AS HUGEINT) * CAST(c AS HUGEINT)) AS s,
       |         sum(CAST(m AS HUGEINT) * CAST(kc AS HUGEINT)) AS ts,
       |         min(m) FILTER (WHERE cb + c > tl) AS lo,
       |         max(m) FILTER (WHERE cb < n - tl) AS hi
       |  FROM t GROUP BY 1)
       |SELECT g AS $groupCol, n, n - 2 * tl AS trim_n,
       |       CASE WHEN n - 2 * tl > 0 THEN
       |         round(CAST(lo AS DOUBLE) / 1e6, 6) END AS lo_cut,
       |       CASE WHEN n - 2 * tl > 0 THEN
       |         round(CAST(hi AS DOUBLE) / 1e6, 6) END AS hi_cut,
       |       round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1e6, 6) AS mean,
       |       CASE WHEN n - 2 * tl > 0 THEN
       |         round(CAST(ts AS DOUBLE) / CAST(n - 2 * tl AS DOUBLE) / 1e6, 6)
       |       END AS trimmed_mean,
       |       CASE WHEN n - 2 * tl > 0 THEN
       |         round((CAST(ts AS DOUBLE)
       |                + CAST(tl AS DOUBLE) * CAST(lo AS DOUBLE)
       |                + CAST(tl AS DOUBLE) * CAST(hi AS DOUBLE))
       |               / CAST(n AS DOUBLE) / 1e6, 6)
       |       END AS winsorized_mean
       |FROM agg""".stripMargin

  /** FANO FACTOR (index of dispersion) of the daily volume per type —
    * the Poisson-ness test the z-score and CUSUM monitors assume away:
    * F = var/mean of the daily counts, 1 under a Poisson arrival
    * process, > 1 for bursty/clumped traffic (retries, batch
    * ingestion, bot storms), < 1 for rate-limited/regularized flows.
    * An alerting threshold tuned on Poisson assumptions misfires
    * exactly when F ≠ 1 — this is the audit that says whether those
    * monitors' assumptions hold per type.
    *
    * Fully exact: daily counts are integers, and F = (d·Σn² − (Σn)²) /
    * (d·Σn) is ONE rational from exact DECIMAL sums — a single double
    * division then round(6). One (type, day) map-side exchange + one
    * type-keyed aggregate.
    *
    * Output: (event_type, n_days, n_events, fano) — fano NULL for a
    * type with zero events (can't arise from the exchange) or a single
    * day (variance undefined at d=1 uses the population form, which is
    * 0/valid; NULL only when Σn = 0).
    */
  def fanoDaily(events: DataFrame, tsCol: String, typeCol: String): DataFrame = {
    def d38(c: Column) = c.cast("decimal(38,0)")
    val daily = events
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("_d"))
      .agg(count(lit(1L)).as("_n"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1L)).as("n_days"),
        sum(col("_n")).as("n_events"),
        sum(d38(col("_n")) * d38(col("_n"))).as("_q"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        when(col("n_events") === 0L, lit(null).cast("double"))
          .otherwise(round(
            (d38(col("n_days")) * col("_q")
              - d38(col("n_events")) * d38(col("n_events"))).cast("double")
              / (col("n_days") * col("n_events")).cast("double"), 6))
          .as("fano"))
  }

  /** DuckDB oracle twin of [[fanoDaily]]. */
  def duckFanoDaily(rel: String, tsCol: String, typeCol: String): String =
    s"""WITH daily AS (
       |  SELECT $typeCol AS event_type, CAST($tsCol AS DATE) AS d,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM $rel GROUP BY 1, 2),
       |a AS (
       |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       |         CAST(sum(n) AS BIGINT) AS n_events,
       |         sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS q
       |  FROM daily GROUP BY 1)
       |SELECT event_type, n_days, n_events,
       |       CASE WHEN n_events <> 0 THEN
       |         round(CAST(CAST(n_days AS HUGEINT) * q
       |                    - CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)
       |                    AS DOUBLE)
       |               / CAST(n_days * n_events AS DOUBLE), 6) END AS fano
       |FROM a""".stripMargin
}
