package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ChangeLog

/** Scale-rehearsal probe for the incremental CDC maintenance family
  * (BASELINE.md round 9): on the same change log, time
  *
  *   - FULL REBUILD: `scd2State(log)` / `cdcMergeState(log)` — the
  *     whole-log window / fold, one dimension-sized exchange;
  *   - INCREMENTAL: `scd2Apply(state, batch)` / `cdcMergeApply` with a
  *     `batchPct` tail batch against a pre-materialized state — the
  *     delta-proportional path (touched keys only are re-windowed; the
  *     untouched dimension rides a broadcast anti join, no big
  *     exchange).
  *
  * Prints one JSON line per measurement. The state is persisted and
  * materialized BEFORE timing the apply, so the incremental number is
  * the apply itself, not state construction — mirroring production
  * where the state already exists on disk.
  *
  * Usage: `runMain graft.RehearseCdc <sfDir> [batchPct]`
  */
object RehearseCdc {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseCdc <sfDir> [batchPct]")
    val sfDir = args(0)
    val batchPct = if (args.length > 1) args(1).toDouble else 1.0
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    // `synth:<rows>:<keys>` generates a range-derived log of the given
    // size — the fixture's 100 k events are too small to surface the
    // exchange-dominated regime the incremental path is built for.
    val raw =
      if (sfDir.startsWith("synth:")) {
        val parts = sfDir.split(":")
        val (rows, keys) = (parts(1).toLong, parts(2).toLong)
        spark.range(rows).select(
          pmod(xxhash64(col("id")), lit(keys)).as("user_id"),
          col("id").as("event_id"),
          timestamp_micros(lit(1704067200000000L) + col("id") * 1000L).as("ts"),
          concat(lit("t"), pmod(col("id"), lit(7))).as("event_type"),
          (pmod(xxhash64(col("id"), lit(7)), lit(1000000L)).cast("double") / 1000.0)
            .as("value"))
      } else Tables.load(spark, sfDir, "events")
    val log = ChangeLog.synthesize(raw, "event_id", "ts")
      .withColumn("_ms", expr(s"unix_micros(`${ChangeLog.CommitTs}`) div 1000"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = log.count()
    // Exact range-based cutoff (an approxQuantile at 99.9% collapses to
    // the max under its default error and yields an empty batch).
    val mm = log.agg(min(col("_ms")), max(col("_ms"))).head()
    val cutMs = mm.getLong(0) +
      ((mm.getLong(1) - mm.getLong(0)) * (1.0 - batchPct / 100.0)).toLong
    val head = log.filter(col("_ms") <= cutMs).drop("_ms")
    val batch = log.filter(col("_ms") > cutMs).drop("_ms")
    val batchN = batch.count()
    println(s"""{"rows":$n,"batchRows":$batchN,"batchPct":$batchPct}""")

    for ((name, buildState, applyBatch) <- Seq[(String,
        () => org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      ("scd2",
        () => ChangeLog.scd2State(head, Seq("user_id"), "event_id", Seq("event_type")),
        st => ChangeLog.scd2Apply(st, batch, Seq("user_id"), "event_id", Seq("event_type"))),
      ("merge",
        () => ChangeLog.cdcMergeState(head, Seq("user_id"), "event_id"),
        st => ChangeLog.cdcMergeApply(st, batch, Seq("user_id"), "event_id")),
      ("agg",
        () => ChangeLog.aggMaintainState(head, Seq("user_id"), "value"),
        st => ChangeLog.aggMaintainApply(st, batch, Seq("user_id"), "value")))) {
      // Materialization must consume a WINDOW-DERIVED column: a bare
      // count() lets Catalyst prune the window (it preserves
      // cardinality) and the "rebuild" would time only the scan.
      def force(df: org.apache.spark.sql.DataFrame): Unit = {
        val probe =
          if (df.columns.contains("version")) "version"
          else if (df.columns.contains("sum_value_q6")) "sum_value_q6"
          else "_merge_ms"
        df.agg(sum(col(probe))).head()
        ()
      }
      // Full rebuild over the whole log, timed cold each call.
      val (_, fullSec) = time {
        force(name match {
          case "scd2" => ChangeLog.scd2State(log.drop("_ms"), Seq("user_id"),
            "event_id", Seq("event_type"))
          case "merge" => ChangeLog.cdcMergeState(log.drop("_ms"),
            Seq("user_id"), "event_id")
          case _ => ChangeLog.aggMaintainState(log.drop("_ms"),
            Seq("user_id"), "value")
        })
      }
      // State materialized OUTSIDE the timed region.
      val state = buildState().persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      state.count()
      val (_, applySec) = time { force(applyBatch(state)) }
      state.unpersist(blocking = false)
      println(f"""{"family":"$name","fullRebuildSec":$fullSec%.2f,"applySec":$applySec%.2f}""")
    }
    spark.stop()
  }
}
