package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Emulation of the Delta facilities the reference's `cdc` sync type uses —
  * time travel (`TIMESTAMP AS OF`, export.py:114), the `table_changes` TVF
  * (export.py:127), and `DESCRIBE HISTORY` (export.py:56) — over a plain
  * parquet **change-log convention**, since no Delta jar ships with the
  * local Spark (SURVEY §7.4).
  *
  * A change log is any DataFrame carrying the data columns plus:
  *   - `_change_type`      ∈ {insert, update_preimage, update_postimage, delete}
  *   - `_commit_timestamp` TIMESTAMP of the commit that produced the row
  *
  * — the exact column vocabulary Delta CDF exposes and the reference's CASE
  * mapping consumes (export.py:121–126).
  *
  * Scale notes: every operator here is a scan + narrow filter/projection
  * (plus one hash aggregate for the snapshot fold), so parquet min/max
  * row-group skipping on `_commit_timestamp` prunes the range scans
  * automatically, and the snapshot fold uses `max_by` partial aggregation
  * rather than a windowed sort (one row per key per mapper on the shuffle).
  */
object ChangeLog {
  val ChangeType = "_change_type"
  val CommitTs = "_commit_timestamp"
  val MpChangeType = "_mp_change_type"

  /** Commit timestamp at MILLISECOND precision (ms epoch). Delta CDF bounds
    * `table_changes` at millisecond ISO timestamps (export.py:115–127) and
    * the watermark protocol's `+1 ms` exclusive start (export.py:91–92)
    * requires ms fidelity: a second-truncated bound would silently skip a
    * commit at `…00.500` when the watermark is `…00.200`. `unix_micros`
    * keeps the arithmetic integral (`div`, not `/` — no double rounding).
    */
  private def commitMs: Column = expr(s"unix_micros(`$CommitTs`) div 1000")

  /** S4 — `DESCRIBE HISTORY t LIMIT 1` → latest commit timestamp in ms
    * (export.py:49–60). History newest-first + LIMIT 1 ≡ max commit ts.
    * Returns 0 for an empty log.
    */
  def latestCommitMs(log: DataFrame): Long = {
    val row = log.agg(max(commitMs)).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** P3 (export.py:121–126): Delta change types → Mixpanel change types.
    * `update_postimage`/`insert` → INSERT, everything else → DELETE.
    */
  def mpChangeType(changeType: Column): Column =
    when(changeType === "update_postimage", "INSERT")
      .when(changeType === "update_preimage", "DELETE")
      .when(changeType === "insert", "INSERT")
      .otherwise("DELETE")

  /** S3 + F4 + P3 — `table_changes(t, start, end)` with the reference's
    * CASE projection (export.py:115–128). Bounds are inclusive ms-epoch;
    * the caller passes `start = cutoff + 1` for the exclusive-start
    * watermark protocol (export.py:92, 115–116). Column order matches the
    * reference's `SELECT CASE … as _mp_change_type, *`.
    *
    * The reference also sets
    * `spark.databricks.delta.changeDataFeed.timestampOutOfRange.enabled`
    * (export.py:196) so Delta tolerates bounds past the latest commit.
    * This emulation needs no analogue: the bounds here are plain filter
    * predicates, so an out-of-range window simply yields zero rows
    * instead of throwing — the behavior that flag opts into.
    */
  def tableChanges(log: DataFrame, startMs: Long, endMs: Long): DataFrame =
    log.filter(commitMs >= startMs && commitMs <= endMs)
      .select(mpChangeType(col(ChangeType)).as(MpChangeType) +: log.columns.map(col): _*)

  /** S2 — `SELECT 'INSERT' as _mp_change_type, * FROM t TIMESTAMP AS OF ts`
    * (export.py:112–114): reconstruct the table state at `tsMs` by folding
    * the change log per key — latest change at-or-before `tsMs` wins, and a
    * final `delete` means the row is absent. All surviving rows are tagged
    * `'INSERT'` exactly as the reference's first-sync snapshot does.
    *
    * `keyCols` is the table's primary key (Delta tracks row identity
    * internally; a parquet log needs it explicit).
    */
  def snapshotAsOf(log: DataFrame, keyCols: Seq[String], tsMs: Long): DataFrame = {
    val dataCols = log.columns.filterNot(c => c == ChangeType || c == CommitTs)
    // update_preimage rows describe the pre-state of an update, never a
    // resulting state — drop them before folding.
    val states = log
      .filter(commitMs <= tsMs && col(ChangeType) =!= "update_preimage")
    val latest = states
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(col(ChangeType) +: dataCols.map(col): _*), col(CommitTs)).as("__s"))
      .filter(col(s"__s.$ChangeType") =!= "delete")
    latest.select(lit("INSERT").as(MpChangeType) +: dataCols.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** Materialized-SNAPSHOT maintenance state (the MERGE INTO side of
    * [[scd2State]]): per key, the single LATEST event — including delete
    * TOMBSTONES, which must shadow older events arriving in later
    * batches — with its commit ms retained for the merge comparator.
    * `tieBreakCol` makes same-ms commits deterministic (the comparator
    * is lexicographic (commit ms, tie-break), so state and full rebuild
    * agree for ANY batch split). Schema: keyCols, the remaining data
    * columns, `_change_type`, `_merge_ms`.
    */
  def cdcMergeState(log: DataFrame, keyCols: Seq[String],
                    tieBreakCol: String): DataFrame =
    foldMergeEvents(projectMergeEvents(log), keyCols, tieBreakCol)

  /** SNAPSHOT DIFF — infer a change feed from two table states when no
    * CDC log exists (the complement of the change-log emulation above:
    * sources without CDF are synced by diffing consecutive snapshots,
    * and the output speaks the same `_change_type` vocabulary Delta CDF
    * does, so everything downstream — the reference's CASE mapping,
    * [[scd2History]], the merge/apply family — consumes it unchanged).
    *
    * Classification per key (null-safe on every compared column):
    * new-only → `insert`; old-only → `delete`; both present with any
    * data column differing → `update_preimage` (old row) +
    * `update_postimage` (new row); identical rows emit nothing.
    *
    * Scale shape: ONE full-outer key join of the two snapshots — the
    * minimal possible plan for a diff — followed by a narrow
    * array-explode that emits 0/1/2 rows per key in the same pass (no
    * second scan per change class). Snapshots bucketed on the key make
    * the join co-located at 100 TB.
    *
    * NULL keys: standard SQL join semantics — a null-keyed row never
    * matches, so it diffs as a delete + insert rather than an update.
    * That is the honest posture for a diff (a null key is not an
    * identity); sources with nullable keys should surrogate them first.
    */
  def inferChanges(oldSnap: DataFrame, newSnap: DataFrame,
                   keyCols: Seq[String]): DataFrame = {
    val dataCols = newSnap.columns.filterNot(keyCols.contains).toSeq
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      "inferChanges: snapshots must share a schema")
    val o = oldSnap.select(
      keyCols.map(col) ++ Seq(lit(true).as("_ino")) ++
        dataCols.map(c => col(c).as(s"_o_$c")): _*)
    val n = newSnap.select(
      keyCols.map(col) ++ Seq(lit(true).as("_inn")) ++
        dataCols.map(c => col(c).as(s"_n_$c")): _*)
    val j = o.join(n, keyCols, "full_outer")
    val changed = dataCols
      .map(c => !(col(s"_o_$c") <=> col(s"_n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def rowOf(side: String, ct: String) =
      struct(dataCols.map(c => col(s"_${side}_$c").as(c)) :+
        lit(ct).as(ChangeType): _*)
    val emitted =
      when(col("_inn").isNull, array(rowOf("o", "delete")))
        .when(col("_ino").isNull, array(rowOf("n", "insert")))
        .when(changed, array(rowOf("o", "update_preimage"),
          rowOf("n", "update_postimage")))
        // unchanged: an empty array of the same struct type (filter
        // keeps the element type without hand-building DDL)
        .otherwise(filter(array(rowOf("o", "delete")), _ => lit(false)))
    j.select(keyCols.map(col) :+ explode(emitted).as("_r"): _*)
      .select(keyCols.map(col) ++ dataCols.map(c => col(s"_r.$c")) :+
        col(s"_r.$ChangeType"): _*)
  }

  /** INCREMENTAL snapshot maintenance — Delta `MERGE INTO` semantics
    * over the change-log convention: splice a change batch into an
    * existing [[cdcMergeState]] by re-folding ONLY the touched keys
    * (null-safe key match, like [[scd2Apply]]); untouched rows pass
    * through one anti join. Cost scales with the batch, not the
    * dimension. Equality contract (gate + spec):
    * `cdcMergeApply(cdcMergeState(log ≤ T), changes > T)` equals
    * `cdcMergeState(full log)` for any split — the fold is associative
    * and commutative under the (ms, tie-break) comparator.
    */
  def cdcMergeApply(state: DataFrame, changes: DataFrame,
                    keyCols: Seq[String], tieBreakCol: String): DataFrame = {
    val newEvents = projectMergeEvents(changes)
    // Broadcast hint: see scd2Apply — the touched set is batch-sized and
    // the planner would otherwise sort-merge the dimension twice.
    val touched = broadcast(newEvents.select(keyCols.map(col): _*).distinct())
    val matchCond = keyCols.map(k => state(k) <=> touched(k)).reduce(_ && _)
    val untouched = state.join(touched, matchCond, "left_anti")
    val replayed = state.join(touched, matchCond, "left_semi")
    untouched.unionByName(
      foldMergeEvents(replayed.unionByName(newEvents), keyCols, tieBreakCol))
  }

  /** User-facing view of a [[cdcMergeState]]: tombstones out, merge
    * bookkeeping dropped, rows tagged `'INSERT'` — the same shape
    * [[snapshotAsOf]] presents for a first sync.
    */
  def cdcMergePresent(state: DataFrame): DataFrame = {
    val dataCols = state.columns.filterNot(c => c == ChangeType || c == "_merge_ms")
    state.filter(col(ChangeType) =!= "delete")
      .select(lit("INSERT").as(MpChangeType) +: dataCols.map(col): _*)
  }

  /** Strip a change-log frame to merge events: data columns (original
    * order), `_change_type`, and the ms commit projection. Preimages are
    * descriptive, never state-bearing.
    */
  private def projectMergeEvents(log: DataFrame): DataFrame = {
    val dataCols = log.columns.filterNot(c => c == ChangeType || c == CommitTs)
    log.filter(col(ChangeType) =!= "update_preimage")
      .select(dataCols.map(col) :+ col(ChangeType) :+ commitMs.as("_merge_ms"): _*)
  }

  /** One hash-aggregate fold to the per-key (ms, tie-break)-max event —
    * `max_by` with a struct comparator, partial-aggregated map-side (one
    * row per key per mapper on the shuffle, the [[snapshotAsOf]] scale
    * shape).
    */
  private def foldMergeEvents(events: DataFrame, keyCols: Seq[String],
                              tieBreakCol: String): DataFrame = {
    val others = events.columns.filterNot(keyCols.contains)
    events.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct(col("_merge_ms"), col(tieBreakCol))).as("__e"))
      .select(keyCols.map(col) ++ others.map(c => col(s"__e.`$c`").as(c)): _*)
  }

  /** SCD Type-2 history build: fold a change log into per-key VERSION
    * INTERVALS — (valid_from_ms, valid_to_ms] with `valid_to_ms` NULL on
    * the open (current) version — the warehouse-dimension shape one step
    * past the reference's SCD-latest (W1+F5 keeps only the newest row;
    * this keeps the full lineage queryable by as-of predicates).
    *
    * Semantics: preimage rows are descriptive, not state-bearing — drop
    * them first. Every remaining change (insert / update_postimage /
    * delete) CLOSES the previous version's interval at its commit ts;
    * delete rows close an interval without opening one, so a deleted key
    * has no current row until a later insert reopens it.
    *
    * Scale shape: ONE exchange on the key for the lead/row_number window
    * (version chains need every version, so the `max_by` collapse of
    * [[snapshotAsOf]] does not apply — the window IS the minimal plan).
    * `tieBreakCol` makes same-ms commits deterministic.
    */
  def scd2History(log: DataFrame, keyCols: Seq[String], tieBreakCol: String,
                  dataCols: Seq[String]): DataFrame =
    scd2Present(scd2State(log, keyCols, tieBreakCol, dataCols))

  /** The SCD2 MAINTENANCE STATE: [[scd2History]] with delete TOMBSTONES
    * retained and the original `_change_type` kept per row — everything
    * [[scd2Apply]] needs to splice a change batch in without replaying
    * the full log (deletes consume version slots and close intervals, so
    * dropping them — as the user-facing view does — would make the
    * history non-incrementable). This is the standard warehouse posture:
    * the stored dimension keeps tombstones, readers see
    * [[scd2Present]].
    */
  def scd2State(log: DataFrame, keyCols: Seq[String], tieBreakCol: String,
                dataCols: Seq[String]): DataFrame =
    scd2Windowize(
      // Ordering by the ms projection (not the raw ts) is safe: unix ms
      // is a monotone transform, and it lets the window run after the
      // narrow select below has already dropped the raw commit column.
      log.filter(col(ChangeType) =!= "update_preimage")
        .select((keyCols ++ Seq(tieBreakCol) ++ dataCols).distinct.map(col)
          :+ col(ChangeType) :+ commitMs.as("valid_from_ms"): _*),
      keyCols, tieBreakCol)

  /** The user-facing view of an SCD2 state: tombstones out, change type
    * dropped — exactly [[scd2History]]'s output.
    */
  def scd2Present(state: DataFrame): DataFrame =
    state.filter(col(ChangeType) =!= "delete").drop(ChangeType)

  /** INCREMENTAL SCD2 maintenance: splice a new change batch into an
    * existing [[scd2State]] WITHOUT replaying the full log — the
    * production shape at 100 TB, where the log tail is GBs against a
    * dimension of TBs. Only keys touched by the batch are rewritten:
    *
    *   1. `touched` = distinct keys in the batch (delta-sized);
    *   2. untouched state rows pass through via one LEFT ANTI join;
    *   3. touched keys' existing rows are stripped back to their events
    *      (key, tie-break, data, change type, valid_from_ms — all
    *      retained in the state), unioned with the batch's events, and
    *      re-windowed per key.
    *
    * Cost scales with (touched history + batch), never with the full
    * dimension; the anti/semi joins are broadcast-able whenever the
    * batch's key set is small. Equality contract (spec + oracle gate):
    * `scd2Apply(scd2State(log ≤ T), changes > T) == scd2State(full log)`
    * for ANY split — the window recomputation sees the identical per-key
    * event multiset, so even out-of-order batch boundaries hold.
    */
  def scd2Apply(state: DataFrame, changes: DataFrame, keyCols: Seq[String],
                tieBreakCol: String, dataCols: Seq[String]): DataFrame = {
    val eventCols = (keyCols ++ Seq(tieBreakCol) ++ dataCols).distinct.map(col) :+
      col(ChangeType) :+ col("valid_from_ms")
    val newEvents = changes.filter(col(ChangeType) =!= "update_preimage")
      .select((keyCols ++ Seq(tieBreakCol) ++ dataCols).distinct.map(col)
        :+ col(ChangeType) :+ commitMs.as("valid_from_ms"): _*)
    // BROADCAST the touched-key set: it is batch-sized by the operator's
    // own delta contract, but the planner cannot size a distinct() over
    // an arbitrary plan and falls back to TWO full sort-merge passes
    // over the dimension (measured 14× slower at a 20 M-row state,
    // BASELINE.md round-9 CDC rehearsal). With the hint both the anti
    // and semi probes are map-side hash lookups on the state scan.
    val touched = broadcast(newEvents.select(keyCols.map(col): _*).distinct())
    // NULL-SAFE key match (`<=>`): a window's null partition is a real
    // version chain, and a plain equi-join would neither replay it
    // (semi misses) nor retire it (anti keeps) when a null-key change
    // arrives — splitting the chain into two version-1 "current" rows.
    val matchCond = keyCols.map(k => state(k) <=> touched(k)).reduce(_ && _)
    val untouched = state.join(touched, matchCond, "left_anti")
    val replayed = state.join(touched, matchCond, "left_semi")
      .select(eventCols: _*)
    untouched.unionByName(
      scd2Windowize(replayed.unionByName(newEvents), keyCols, tieBreakCol))
  }

  /** POINT-IN-TIME dimension lookup over an SCD2 history — join each
    * fact to the dimension VERSION that was valid when the fact
    * happened (`valid_from_ms ≤ fact_ms < valid_to_ms`, half-open like
    * the history itself), the query SCD2 exists to answer. Facts inside
    * a deleted gap (interval closed by a tombstone, nothing reopened
    * yet) match no version and drop out — the dimension row genuinely
    * did not exist at that time.
    *
    * Scale shape: an EQUI-join on the key with the interval test as a
    * residual filter — per-key version counts are small, so this is one
    * key exchange (or a broadcast when the dimension is), never an
    * interval/theta join. Dimension columns come back prefixed `dim_`,
    * the version as `dim_version`.
    */
  def scd2Lookup(facts: DataFrame, history: DataFrame, keyCols: Seq[String],
                 tsCol: String, dimCols: Seq[String]): DataFrame = {
    val h = history.select(
      keyCols.map(col) ++
        Seq(col("valid_from_ms"), col("valid_to_ms"),
          col("version").as("dim_version")) ++
        dimCols.map(c => col(c).as(s"dim_$c")): _*)
    val f = facts.withColumn("_fact_ms", expr(s"unix_micros(`$tsCol`) div 1000"))
    f.join(h, keyCols)
      .filter(col("_fact_ms") >= col("valid_from_ms") &&
        (col("valid_to_ms").isNull || col("_fact_ms") < col("valid_to_ms")))
      .select(facts.columns.map(col) ++
        Seq(col("dim_version")) ++ dimCols.map(c => col(s"dim_$c")): _*)
  }

  /** Shared interval math over SCD2 event rows
    * (…, `_change_type`, valid_from_ms): one key-partitioned window
    * assigns closing bounds, version numbers, and currency.
    */
  private def scd2Windowize(events: DataFrame, keyCols: Seq[String],
                            tieBreakCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("valid_from_ms").asc, col(tieBreakCol).asc)
    events
      .withColumn("valid_to_ms", lead(col("valid_from_ms"), 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("is_current", col("valid_to_ms").isNull.cast("int"))
  }

  /** 6-dp value quantum for the aggregate-maintenance state: each value
    * is quantized ONCE to BIGINT and every downstream sum is integer
    * arithmetic — split-invariant and engine-exact (the [[Drift]]
    * posture). |v| ≤ 9.2e12 fits the quantum inside Long.
    */
  val AggQuantum: Long = 1000000L

  /** +1 for state-bearing changes, −1 for retractions — the standard
    * delta-processing signs of incremental view maintenance: an update's
    * preimage retracts the old row, its postimage asserts the new one.
    */
  private def aggSign: Column =
    when(col(ChangeType).isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))

  /** Signed per-key aggregate delta of a change batch: Δcount and
    * Δsum(value) (6-dp-quantized BIGINT). The building block of
    * [[aggMaintainApply]]; over a full log it IS the maintained state.
    */
  def aggDelta(changes: DataFrame, keyCols: Seq[String],
               valueCol: String): DataFrame =
    changes
      .select(keyCols.map(col) :+ aggSign.as("_sgn") :+
        coalesce(floor(col(valueCol).cast("double") * AggQuantum + lit(0.5))
          .cast("long"), lit(0L)).as("_q"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_sgn")).as("n_rows"),
        sum(col("_sgn") * col("_q")).as("sum_value_q6"))

  /** INCREMENTAL AGGREGATE maintenance — a materialized per-key
    * (count, sum) view kept current from the change feed alone, the IVM
    * (incremental view maintenance) complement of [[cdcMergeApply]]'s
    * row-level MERGE: at 100 TB the base table is never rescanned to
    * refresh an aggregate; each sync folds the batch-sized delta in.
    * Only ADDITIVE aggregates maintain this way (count/sum and anything
    * derived from them — avg, variance via Σx/Σx²); min/max/distinct
    * need the [[Sketches]] mergeable-sketch route instead.
    *
    * Equality contract (gate + spec): for ANY split of the log,
    * `aggMaintainApply(aggMaintainState(log ≤ T), changes > T)` equals
    * `aggMaintainState(full log)` — integer sums are associative and
    * commutative, so even out-of-order batches converge.
    */
  def aggMaintainState(log: DataFrame, keyCols: Seq[String],
                       valueCol: String): DataFrame =
    aggDelta(log, keyCols, valueCol)

  /** Splice a change batch into an existing [[aggMaintainState]]. The
    * delta aggregate is batch-sized; with the broadcast hint (sizing
    * rationale at [[scd2Apply]]) the anti/semi probes are map-side hash
    * lookups on the state scan — cost scales with the batch, never the
    * state. Zero rows are NOT retired here (a (0, 0) key row is
    * algebraically identical to an absent one under this merge);
    * [[aggPresent]] hides them from readers.
    */
  def aggMaintainApply(state: DataFrame, changes: DataFrame,
                       keyCols: Seq[String], valueCol: String): DataFrame = {
    val delta = aggDelta(changes, keyCols, valueCol)
    val touched = broadcast(delta.select(keyCols.map(col): _*))
    val matchCond = keyCols.map(k => state(k) <=> touched(k)).reduce(_ && _)
    val untouched = state.join(touched, matchCond, "left_anti")
    val replayed = state.join(touched, matchCond, "left_semi")
    untouched.unionByName(
      replayed.unionByName(delta)
        .groupBy(keyCols.map(col): _*)
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("sum_value_q6")).as("sum_value_q6")))
  }

  /** Reader view of an aggregate-maintenance state: keys whose row count
    * has gone to zero (fully retracted) are absent, like any other view
    * over a table with no rows for that key.
    */
  def aggPresent(state: DataFrame): DataFrame =
    state.filter(col("n_rows") =!= 0L)

  /** Synthesize a change log from any table for tests/demo pipelines: a
    * deterministic `_change_type` derived from a key column and a
    * `_commit_timestamp` taken from an existing timestamp column. Mirrors
    * the shape Delta CDF would emit without requiring Delta.
    */
  def synthesize(df: DataFrame, keyCol: String, tsCol: String): DataFrame =
    df.withColumn(ChangeType,
        when(pmod(col(keyCol), lit(10)) < 6, "insert")
          .when(pmod(col(keyCol), lit(10)) < 8, "update_postimage")
          .when(pmod(col(keyCol), lit(10)) < 9, "update_preimage")
          .otherwise("delete"))
      .withColumn(CommitTs, col(tsCol))
}
