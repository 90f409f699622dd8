package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamSync

/** CONTINUOUS-ingest rehearsal (VERDICT r13 #7): the streaming scale
  * evidence so far came from the one-batch bounded replays, which are
  * state-store-commit-dominated by construction; this main drives the
  * two foreachBatch maintenance paths through MANY micro-batches at a
  * scale fixture and prints per-trigger operator time, so the record
  * shows the amortized per-batch cost profile of CONTINUOUS ingest
  * rather than a single-trigger posture:
  *
  *   - [[StreamSync.startDedupedIngest]]: seed corpus = first
  *     `corpusN` docs; the remainder streams in `nBatches` chunks,
  *     each screened against corpus + previously-ingested output;
  *   - [[StreamSync.startAggMaintenance]]: the events table as an
  *     insert-only change log in `nBatches` chronological chunks, each
  *     spliced into the parquet running-aggregate state.
  *
  * Expectation: dedup per-trigger time grows mildly with the ingested
  * index (the foreachBatch body re-scans the output dir — the
  * documented integration point where production keeps a banded index
  * table) while per-ROW cost stays flat-to-falling; agg maintenance
  * per-trigger time is flat (state size is key-bounded), so amortized
  * per-batch cost falls as warmup amortizes.
  *
  * Usage: `runMain graft.RehearseIngest <sfDir> [nBatches] [corpusN]`.
  */
object RehearseIngest {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseIngest <sfDir> [nBatches] [corpusN]")
    val dir = args(0)
    val nBatches = if (args.length > 1) args(1).toInt else 15
    val corpusN = if (args.length > 2) args(2).toLong else 10000L
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // us/row uses the FED chunk size: foreachBatch bodies re-scan the
    // batch (indexDedup reads it for banding AND verification), so the
    // progress numInputRows multi-counts those scans.
    def perBatch(q: org.apache.spark.sql.streaming.StreamingQuery,
                 label: String, rowsPerBatch: Long): Unit = {
      q.recentProgress.foreach { p =>
        val add = Option(p.durationMs.get("addBatch")).map(_.longValue).getOrElse(0L)
        val trig = Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(0L)
        if (p.numInputRows > 0)
          println(f"[ingest] $label batch ${p.batchId}%3d: op ${add}%6d ms " +
            f"trigger ${trig}%6d ms rows ~$rowsPerBatch%8d " +
            f"us/row ${add * 1000.0 / math.max(rowsPerBatch, 1)}%8.1f")
      }
    }

    // ---- continuous deduped ingest over documents -------------------
    locally {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val stream = docs.filter(col("doc_id") >= corpusN)
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val corpus = docs.filter(col("doc_id") < corpusN)
      val outDir = java.nio.file.Files.createTempDirectory("graft_ingest_out")
        .resolve("docs").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
      val input = MemoryStream[(Long, String)]
      val q = StreamSync.startDedupedIngest(
        input.toDF().toDF("doc_id", "text"), corpus, "text", "doc_id",
        outDir, ckpt)
      val t0 = System.nanoTime()
      try {
        val chunk = math.max(1, math.ceil(stream.size.toDouble / nBatches).toInt)
        stream.grouped(chunk).foreach { b =>
          input.addData(b)
          q.processAllAvailable()
        }
        perBatch(q, "dedup_ingest", stream.size.toLong / nBatches)
      } finally q.stop()
      val kept = spark.read.parquet(outDir).count()
      println(f"[ingest] dedup_ingest total ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"streamed ${stream.size} kept $kept over $nBatches batches")
    }

    // ---- continuous aggregate maintenance over events ---------------
    locally {
      val ev = Tables.load(spark, dir, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull && col("ts").isNotNull)
        .select(col("user_id").cast("long"), col("value").cast("double"), col("ts"))
        .as[(Long, Double, java.sql.Timestamp)].collect().sortBy(_._3.getTime).toSeq
      val ckpt = java.nio.file.Files.createTempDirectory("graft_agg_ckpt").toString
      val stateDir = java.nio.file.Files.createTempDirectory("graft_agg_state")
        .resolve("state").toString
      val input = MemoryStream[(Long, Double, java.sql.Timestamp, String)]
      val q = StreamSync.startAggMaintenance(
        input.toDF().toDF("user_id", "value",
          graft.operators.ChangeLog.CommitTs, graft.operators.ChangeLog.ChangeType)
          .select(col("user_id"), col("value"),
            col(graft.operators.ChangeLog.ChangeType),
            col(graft.operators.ChangeLog.CommitTs)),
        Seq("user_id"), "value", stateDir, ckpt)
      val t0 = System.nanoTime()
      try {
        val chunk = math.max(1, math.ceil(ev.size.toDouble / nBatches).toInt)
        ev.grouped(chunk).foreach { b =>
          input.addData(b.map(r => (r._1, r._2, r._3, "insert")))
          q.processAllAvailable()
        }
        perBatch(q, "agg_maintain", ev.size.toLong / nBatches)
      } finally q.stop()
      val keys = spark.read.parquet(stateDir).count()
      println(f"[ingest] agg_maintain total ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"events ${ev.size} state_keys $keys over $nBatches batches")
    }

    spark.stop()
  }
}
