package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.StreamSync

/** LONG-RUNNING state-store A/B (r16, VERDICT r15 #7): heap
  * (HDFSBackedStateStoreProvider, the default) vs RocksDB under state
  * that OUTGROWS comfortable heap residency, sustained over many
  * micro-batch commits.
  *
  * The r15 one-shot replays measured RocksDB LOSING (JNI + per-commit
  * checkpoint overhead with nothing amortizing it) and refined the
  * claim to "RocksDB is for long-running state beyond heap" — which was
  * at that point an unmeasured posture. This main measures it: the
  * dedup replay keeps ONE state row per distinct event id with a
  * watermark long past the fixture's span, so state grows monotonically
  * across every commit — by the final batches the heap store is
  * carrying the full doubled event count in JVM maps (the exact shape
  * that spent 28–42 s in GC at sf10 in r15) while RocksDB keeps it
  * off-heap. Many micro-batches (default 24) make per-commit
  * maintenance amortize the way a real continuous ingest does, not the
  * one-shot commit profile.
  *
  * Protocol: alternating provider runs (heap, rocksdb, heap, rocksdb)
  * so JVM warmup and accumulated session state bias neither side; the
  * per-provider MIN is the comparison number. Per-batch operator times
  * print via the replay harness's `[stream]` telemetry (stderr); this
  * main prints one `[statestore]` line per run (wall, GC delta, rows)
  * and a final verdict line with the min-vs-min ratio.
  *
  * Usage: `runMain graft.RehearseStateStore <sfDir> [nBatches]`.
  */
object RehearseStateStore {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseStateStore <sfDir> [nBatches]")
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 24
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }

    val ev = Tables.load(spark, dir, "events")
    val results = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    for (round <- 1 to 2; provider <- Seq("heap", "rocksdb")) {
      if (provider == "rocksdb") sys.props("graft.replay.statestore") = "rocksdb"
      else sys.props.remove("graft.replay.statestore")
      System.gc() // don't bill one provider for the other's garbage
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      // Watermark far past the fixture's event-time span: nothing ever
      // evicts, state rows == distinct ids seen — monotone growth.
      val rows = StreamSync.replayDedup(ev, "event_id", "ts",
        watermarkDelay = "3650 days", nChunks = nBatches).count()
      val wall = (System.nanoTime() - t0) / 1e9
      results(provider) = wall :: results(provider)
      println(f"[statestore] round $round provider=$provider%-8s wall $wall%7.1f s " +
        f"gc ${gcMillis() - gc0}%6d ms state_rows $rows%d batches ~$nBatches")
    }
    sys.props.remove("graft.replay.statestore")
    val heap = results("heap").min
    val rocks = results("rocksdb").min
    println(f"[statestore] verdict: heap_min $heap%.1f s rocksdb_min $rocks%.1f s " +
      f"rocksdb/heap ${rocks / heap}%.2f (<1 means RocksDB wins at this state size)")
    spark.stop()
  }
}
