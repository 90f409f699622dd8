package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sync-mode semantics of the reference engine, re-expressed as DataFrame
  * transformations instead of SQL-string templating.
  *
  * The reference dispatches on `--sync_type` ∈ {full, time-based,
  * scd-latest, cdc} (export.py:131–190) and builds a SQL string; here each
  * mode is a case of an ADT and `Sync.plan` composes Catalyst operators
  * directly, so predicate pushdown / column pruning apply without any
  * string manipulation.
  */
sealed trait SyncMode
object SyncMode {

  /** Full snapshot export (export.py:168–173). */
  case object Full extends SyncMode

  /** Watermark-bounded incremental export (export.py:159–167).
    *
    * @param updatedCol timestamp column the watermark applies to
    * @param cutoffMs   inclusive lower bound, ms epoch (`--time_cutoff_ms`)
    * @param delayMs    late-data delay; with [[nowMs]] > 0 adds the upper
    *                   bound `unix_timestamp(col)*1000 <= nowMs - delayMs`
    *                   (export.py:164–166)
    * @param nowMs      externally supplied "now" for consistent filtering
    */
  final case class TimeBased(updatedCol: String, cutoffMs: Long,
                             delayMs: Long = 0L, nowMs: Long = 0L) extends SyncMode

  /** Per-group latest-row dedup (export.py:174–188): `ROW_NUMBER() OVER
    * (PARTITION BY groupIdCol ORDER BY scdTimeCol DESC) = 1`.
    *
    * The reference keeps the constant `row_num = 1` column in the exported
    * schema (export.py:180–185); `keepRank = false` drops it.
    * `tieBreakers` appends extra descending sort keys — the reference's
    * plain `ORDER BY t DESC` is nondeterministic on ties.
    */
  final case class ScdLatest(groupIdCol: String, scdTimeCol: String,
                             keepRank: Boolean = true,
                             tieBreakers: Seq[String] = Nil) extends SyncMode
}

object Sync {

  /** F1 (export.py:19–28): `c IS NOT NULL AND c != ''` AND-joined over the
    * listed columns; `None` when the list is empty (no WHERE clause).
    */
  def nonNullableFilter(cols: Seq[String]): Option[Column] =
    cols.filter(_.nonEmpty)
      .map(c => col(c).isNotNull && col(c) =!= "")
      .reduceOption(_ && _)

  /** F2 (export.py:161): `unix_timestamp(c)*1000 >= cutoffMs`. NOTE
    * `unix_timestamp` is second-precision — the ×1000 scales, it does not
    * add ms precision; preserved deliberately for parity.
    */
  def watermarkLowerBound(updatedCol: String, cutoffMs: Long): Column =
    unix_timestamp(col(updatedCol)) * lit(1000L) >= lit(cutoffMs)

  /** F3 (export.py:164–166): late-data upper bound, active only when both
    * delay and now are positive.
    */
  def delayUpperBound(updatedCol: String, delayMs: Long, nowMs: Long): Option[Column] =
    if (delayMs > 0 && nowMs > 0)
      Some(unix_timestamp(col(updatedCol)) * lit(1000L) <= lit(nowMs - delayMs))
    else None

  /** Compose a sync plan over a source DataFrame. CDC flows through
    * [[ChangeLog]] instead (it needs the change-log source, not a plain
    * table scan).
    */
  def plan(df: DataFrame, mode: SyncMode, nonNullableCols: Seq[String] = Nil): DataFrame = {
    val base = nonNullableFilter(nonNullableCols).fold(df)(df.filter)
    mode match {
      case SyncMode.Full => base

      case SyncMode.TimeBased(c, cutoff, delay, now) =>
        val lower = base.filter(watermarkLowerBound(c, cutoff))
        delayUpperBound(c, delay, now).fold(lower)(lower.filter)

      case SyncMode.ScdLatest(g, t, keepRank, ties) =>
        val order = (t +: ties).map(col(_).desc)
        val ranked = base.withColumn("row_num",
          row_number().over(Window.partitionBy(col(g)).orderBy(order: _*)))
        val top = ranked.filter(col("row_num") === 1)
        if (keepRank) top else top.drop("row_num")
    }
  }

  /** Scale-oriented alternative to [[SyncMode.ScdLatest]] (SURVEY §4.3):
    * `groupBy(g).agg(max_by(struct(*), t))` — same rows (when the order
    * key is unique per group). It plans as a partial+final SortAggregate
    * (struct buffers aren't hash-aggregable — measured, PlanAuditSpec
    * "wide-table scd-latest"), so its advantage over the Window path is
    * NOT sort elimination: it's the map-side partial collapse to one
    * buffer per (group, partition) before the exchange, no rank column
    * on the wire, and no final Window pass — never more shuffle volume
    * than WindowGroupLimit, and measurably faster end-to-end.
    * `orderExpr` may be a struct for tie-broken ordering.
    */
  def latestByGroup(df: DataFrame, groupIdCol: String, orderExpr: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(col(groupIdCol).as("__g"))
      .agg(max_by(struct(cols.map(col): _*), orderExpr).as("__latest"))
      .select(cols.map(c => col(s"__latest.$c").as(c)): _*)
  }
}
