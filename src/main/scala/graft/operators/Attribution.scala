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

  /** TIME-DECAY multi-touch attribution — the remaining standard model
    * next to [[lastTouch]] (all credit to recency), [[linearTouch]]
    * (equal credit), and [[markovRemoval]] (counterfactual credit):
    * each in-window touch earns weight halved per elapsed half-life,
    * and the conversion value splits ∝ weight.
    *
    * EXACT halving, no pow(): the weight is the integer
    * `10⁶ >> ⌊Δt/halfLife⌋` (zero beyond 20 half-lives — 10⁶ < 2²⁰ —
    * with an explicit clamp: a raw shift would wrap at 64 on both
    * JVMs and C++), so shares are pure BIGINT products and floor
    * divisions like [[linearTouch]]'s micro-credits. Touches whose
    * weight quantizes to zero are EXCLUDED from attribution (they
    * carry no credit and would only pad the touch counts).
    *
    * Scale shape: identical to [[linearTouch]] — the bucketed interval
    * join, one per-conversion window for Σw, map-side final rollup.
    * Output: (touch_type, conversions, attributed_value) + '(none)'.
    */
  def timeDecayTouch(events: DataFrame, userCol: String, tsCol: String,
                     idCol: String, typeCol: String, valueCol: String,
                     touchTypes: Seq[String], convType: String,
                     lookbackMs: Long, halfLifeMs: Long): DataFrame = {
    require(!touchTypes.contains(convType),
      s"timeDecayTouch: convType '$convType' must not be a touch type")
    require(halfLifeMs > 0, s"timeDecayTouch: bad halfLifeMs=$halfLifeMs")
    val lookbackUs = lookbackMs * 1000L
    val halfLifeUs = halfLifeMs * 1000L
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
    val k = expr(s"((_end - 1) - _tus) div ${halfLifeUs}L")
    val weighted = joined
      .withColumn("_w",
        when(k >= 20L, lit(0L))
          .otherwise(call_function("shiftright", lit(1000000L), k.cast("int"))))
      .filter(col("_w") > 0L)
    val w = Window.partitionBy(col("_cid"))
    val shares = weighted
      .withColumn("_sw", sum(col("_w")).over(w))
      .select(col("_cid"), col("touch_type"),
        expr("(_vmic * _w) div _sw").as("_share"))
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

  /** DuckDB oracle twin of [[timeDecayTouch]]. */
  def duckTimeDecayTouch(rel: String, userCol: String, tsCol: String,
                         idCol: String, typeCol: String, valueCol: String,
                         touchTypes: Seq[String], convType: String,
                         lookbackMs: Long, halfLifeMs: Long): String = {
    val inList = touchTypes.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val conv = s"'${convType.replace("'", "''")}'"
    val lookbackUs = lookbackMs * 1000L
    val halfLifeUs = halfLifeMs * 1000L
    s"""WITH tch AS (SELECT $userCol AS u, epoch_us($tsCol) AS tus,
       |                    $typeCol AS touch_type
       |             FROM $rel WHERE $typeCol IN ($inList)),
       |cv AS (SELECT $userCol AS u, $idCol AS cid, epoch_us($tsCol) AS cus,
       |              CAST(floor($valueCol * 1e6) AS BIGINT) AS vmic
       |       FROM $rel WHERE $typeCol = $conv),
       |j AS (SELECT cv.cid, cv.vmic, tch.touch_type,
       |             (cv.cus - tch.tus) // $halfLifeUs AS k
       |      FROM tch JOIN cv ON tch.u = cv.u
       |        AND tch.tus >= cv.cus - $lookbackUs AND tch.tus <= cv.cus),
       |wj AS (SELECT cid, vmic, touch_type,
       |              CASE WHEN k >= 20 THEN CAST(0 AS BIGINT)
       |                   ELSE CAST(1000000 AS BIGINT) >> CAST(k AS INT)
       |              END AS w
       |       FROM j),
       |wk AS (SELECT * FROM wj WHERE w > 0),
       |sh AS (SELECT cid, touch_type,
       |              (vmic * w) // (sum(w) OVER (PARTITION BY cid)) AS share
       |       FROM wk),
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

  // ------------------------------------- Markov (data-driven) attribution

  val StartState = "(start)"
  val ConvState = "(conv)"
  val NullState = "(null)"
  val MarkovScale = 1000000000000L // 1e12 micro-units per probability unit

  /** First-order Markov TRANSITION COUNTS over user journeys — the
    * distributed half of removal-effect attribution. A journey is a
    * user's touch sequence ordered by (ts, id), truncated strictly
    * before the user's FIRST conversion; it emits START→first,
    * touchᵢ→touchᵢ₊₁, last→CONV (converted) or last→NULL (not), and
    * converters with zero prior touches emit START→CONV.
    *
    * Scale shape: ONE user-keyed exchange carries the first-conversion
    * marker, the lag/lead sequence windows, and the journey emission;
    * the output is (states+2)² rows AT MOST — metadata scale by
    * construction, whatever the corpus size.
    * Output: (state_from, state_to, cnt).
    */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
                        idCol: String, typeCol: String,
                        touchTypes: Seq[String], convType: String): DataFrame = {
    require(!touchTypes.contains(convType),
      s"markovTransitions: convType '$convType' must not be a touch type")
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val key = struct(col(tsCol), col(idCol))
    val wAll = Window.partitionBy(col(userCol))
    val ev = events.filter(isTouch || col(typeCol) === convType)
      .withColumn("_ck",
        min(when(col(typeCol) === convType, key)).over(wAll))
    val touches = ev
      .filter(isTouch && (col("_ck").isNull || key < col("_ck")))
      .withColumn("_conv", col("_ck").isNotNull)
    val wSeq = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val seq = touches
      .withColumn("_prev", lag(col(typeCol), 1).over(wSeq))
      .withColumn("_next", lead(col(typeCol), 1).over(wSeq))
    val steps = seq.select(
      coalesce(col("_prev"), lit(StartState)).as("state_from"),
      col(typeCol).as("state_to"))
    val ends = seq.filter(col("_next").isNull).select(
      col(typeCol).as("state_from"),
      when(col("_conv"), lit(ConvState)).otherwise(lit(NullState))
        .as("state_to"))
    // Converters whose journey is empty: START→CONV directly.
    val lonely = ev.filter(col(typeCol) === convType)
      .select(col(userCol).as("_u")).distinct()
      .join(touches.select(col(userCol).as("_u")).distinct(),
        Seq("_u"), "left_anti")
      .select(lit(StartState).as("state_from"), lit(ConvState).as("state_to"))
    steps.unionByName(ends).unionByName(lonely)
      .groupBy(col("state_from"), col("state_to"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** K-step fixed-point-integer value iteration for the absorption
    * probability P(reach CONV) from each state, with `pinned` (the
    * removed channel) forced to absorb at 0 — run DRIVER-SIDE over the
    * collected transition matrix, which is bounded at (channels+2)²
    * rows by construction (the k-means-centroid/BPE-argmax posture:
    * coordinator state is metadata, never corpus). All arithmetic is
    * BigInt micro-units with floor division — bit-identical to the
    * oracle's HUGEINT CTE chain at any iteration count.
    */
  private def absorb(trans: Seq[(String, String, Long)], iters: Int,
                     pinned: Option[String]): Map[String, Long] = {
    val out = trans.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._3).sum }
    val states = out.keySet
    var v: Map[String, Long] = states.map(_ -> 0L).toMap
    def look(vNow: Map[String, Long])(s: String): Long =
      if (pinned.contains(s)) 0L
      else if (s == ConvState) MarkovScale
      else if (s == NullState) 0L
      else vNow.getOrElse(s, 0L)
    for (_ <- 1 to iters) {
      val cur = v
      v = states.map { s =>
        if (pinned.contains(s)) s -> 0L
        else {
          val num = trans.filter(_._1 == s)
            .map { case (_, to, c) => BigInt(c) * BigInt(look(cur)(to)) }
            .foldLeft(BigInt(0))(_ + _)
          s -> (num / BigInt(out(s))).toLong
        }
      }.toMap
    }
    v
  }

  /** MARKOV REMOVAL-EFFECT attribution — the data-driven member of the
    * attribution family ([[lastTouch]] credits the final touch,
    * [[linearTouch]] splits evenly; this one asks the chain "how much
    * conversion probability disappears if channel c vanished?").
    * Removing a channel ≡ pinning its absorption value to 0 in the
    * UNCHANGED chain (paths through it die, denominators stay).
    *
    * Output, one row per touch type: (touch_type, p_conv, p_removed,
    * removal_effect, attribution) where attribution normalizes the
    * integer micro-unit effects (exact BIGINT numerator/denominator —
    * no float sums), NULL when all effects are zero.
    */
  def markovRemoval(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, typeCol: String, touchTypes: Seq[String],
                    convType: String, iters: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val trans = markovTransitions(events, userCol, tsCol, idCol, typeCol,
        touchTypes, convType)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val pFull = absorb(trans, iters, None).getOrElse(StartState, 0L)
    val effects = touchTypes.map { c =>
      val pRem = absorb(trans, iters, Some(c)).getOrElse(StartState, 0L)
      (c, pRem, pFull - pRem)
    }
    val den = effects.map(_._3).sum
    effects.map { case (c, pRem, eff) =>
      val attribution =
        if (den == 0L) None
        else Some(BigDecimal(eff.toDouble / den.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val removal =
        if (pFull == 0L) None
        else Some(BigDecimal(eff.toDouble / pFull.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (c,
        BigDecimal(pFull.toDouble / MarkovScale.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        BigDecimal(pRem.toDouble / MarkovScale.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        removal, attribution)
    }.toDF("touch_type", "p_conv", "p_removed", "removal_effect",
      "attribution")
  }

  /** DuckDB oracle twin of [[markovRemoval]] — the same journey CTEs,
    * then one HUGEINT value-iteration CTE chain per (full + each
    * removed channel) run. Everything after the journey pass operates
    * on the (channels+2)²-row transition table.
    */
  def duckMarkovRemoval(rel: String, userCol: String, tsCol: String,
                        idCol: String, typeCol: String,
                        touchTypes: Seq[String], convType: String,
                        iters: Int): String = {
    val inList = touchTypes.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    val conv = s"'${convType.replace("'", "''")}'"
    def chain(tag: String, pinned: Option[String]): String = {
      val pin = pinned.map(p => s"'${p.replace("'", "''")}'")
      def lookup(prev: String): String = {
        val base =
          s"""CASE WHEN t.state_to = '$ConvState' THEN $MarkovScale
             |     WHEN t.state_to = '$NullState' THEN 0
             |     ELSE coalesce($prev.v, 0) END""".stripMargin
        pin.fold(base)(p => s"CASE WHEN t.state_to = $p THEN 0 ELSE $base END")
      }
      val zero = pin.fold("")(p => s"CASE WHEN o.state_from = $p THEN 0 ELSE ")
      val zeroEnd = pin.fold("")(_ => " END")
      val init =
        s"${tag}0 AS (SELECT state_from AS state, CAST(0 AS BIGINT) AS v FROM outc)"
      val steps = (1 to iters).map { i =>
        s"""$tag$i AS (
           |  SELECT o.state_from AS state,
           |         $zero CAST(sum(CAST(t.cnt AS HUGEINT) * (${lookup(s"p$i")}))
           |              // o.outn AS BIGINT) $zeroEnd AS v
           |  FROM outc o
           |  JOIN trans t ON t.state_from = o.state_from
           |  LEFT JOIN ${tag}${i - 1} p$i ON p$i.state = t.state_to
           |  GROUP BY o.state_from, o.outn)""".stripMargin
      }
      (init +: steps).mkString(",\n")
    }
    val chains = chain("fv", None) +: touchTypes.zipWithIndex.map {
      case (c, i) => chain(s"rv$i", Some(c))
    }
    val effs = touchTypes.indices.map(i =>
      s"((SELECT v FROM fv$iters WHERE state = '$StartState') - " +
        s"(SELECT v FROM rv$i$iters WHERE state = '$StartState'))")
    val den = effs.mkString(" + ")
    val rows = touchTypes.zipWithIndex.map { case (c, i) =>
      val eff = effs(i)
      s"""SELECT '${c.replace("'", "''")}' AS touch_type,
         |  round(CAST(pf AS DOUBLE) / $MarkovScale.0, 6) AS p_conv,
         |  round(CAST(pr AS DOUBLE) / $MarkovScale.0, 6) AS p_removed,
         |  CASE WHEN pf <> 0
         |       THEN round(CAST(ef AS DOUBLE) / CAST(pf AS DOUBLE), 6)
         |  END AS removal_effect,
         |  CASE WHEN ($den) <> 0
         |       THEN round(CAST(ef AS DOUBLE) / CAST(($den) AS DOUBLE), 6)
         |  END AS attribution
         |FROM (SELECT
         |  (SELECT v FROM fv$iters WHERE state = '$StartState') AS pf,
         |  (SELECT v FROM rv$i$iters WHERE state = '$StartState') AS pr,
         |  $eff AS ef)""".stripMargin
    }
    // AS MATERIALIZED: trans/outc are referenced by every value-
    // iteration step of every chain (~4·iters times) — without the
    // hint DuckDB re-inlines the whole journey windowing per reference.
    s"""WITH ev AS MATERIALIZED (
       |  SELECT $userCol AS u, $tsCol AS ts, $idCol AS id, $typeCol AS ty,
       |         min(CASE WHEN $typeCol = $conv
       |                  THEN {'ts': $tsCol, 'id': $idCol} END)
       |           OVER (PARTITION BY $userCol) AS ck
       |  FROM $rel WHERE $typeCol IN ($inList) OR $typeCol = $conv),
       |touches AS MATERIALIZED (
       |  SELECT u, ts, id, ty, ck IS NOT NULL AS converted,
       |         lag(ty) OVER w AS prev, lead(ty) OVER w AS nxt
       |  FROM ev
       |  WHERE ty IN ($inList)
       |    AND (ck IS NULL OR {'ts': ts, 'id': id} < ck)
       |  WINDOW w AS (PARTITION BY u ORDER BY ts, id)),
       |trans AS MATERIALIZED (
       |  SELECT state_from, state_to, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (
       |    SELECT coalesce(prev, '$StartState') AS state_from,
       |           ty AS state_to FROM touches
       |    UNION ALL
       |    SELECT ty, CASE WHEN converted THEN '$ConvState'
       |                    ELSE '$NullState' END
       |    FROM touches WHERE nxt IS NULL
       |    UNION ALL
       |    SELECT '$StartState', '$ConvState'
       |    FROM (SELECT DISTINCT u FROM ev WHERE ty = $conv) cu
       |    WHERE NOT EXISTS (SELECT 1 FROM touches t WHERE t.u = cu.u))
       |  GROUP BY 1, 2),
       |outc AS MATERIALIZED (
       |  SELECT state_from, CAST(sum(cnt) AS BIGINT) AS outn
       |  FROM trans GROUP BY 1),
       |${chains.mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
