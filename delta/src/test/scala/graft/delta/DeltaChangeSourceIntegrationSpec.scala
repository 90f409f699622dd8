package graft.delta

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChangeLog

/** End-to-end gate for the real-Delta [[DeltaChangeSource]] drop-in —
  * compiled and run ONLY when a delta-spark jar is present (the same
  * build.sbt gate as the main source set; without the jar `sbt
  * delta/test` is a clean no-op, and DeltaSourceSyntaxSpec in the root
  * suite still parser-checks this file). One command:
  *
  *   DELTA_JARS=/path/with/delta-jars sbt delta/test
  *
  * The spec builds a real CDF-enabled Delta table, makes two commits
  * (insert, then update+delete+insert), and pins the full ChangeSource
  * contract the parquet emulation's oracle gates pin:
  *
  *   - latestCommitMs agrees with DESCRIBE HISTORY;
  *   - snapshotAsOf between the commits sees exactly commit 1, every
  *     row tagged 'INSERT' (export.py:112–114 semantics);
  *   - tableChanges over commit 2's window carries the
  *     update_pre/postimage → DELETE/INSERT mapping and ms-exact
  *     bounds (export.py:115–128);
  *   - an IDLE window (start past the last commit) yields an EMPTY
  *     frame with the full CDF schema instead of Delta's
  *     timestampGreaterThanLatestCommit error (r15 guard).
  */
class DeltaChangeSourceIntegrationSpec extends AnyFunSuite {

  private def withSession(f: SparkSession => Unit): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-delta-e2e")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions",
        "io.delta.sql.DeltaSparkSessionExtension")
      .config("spark.sql.catalog.spark_catalog",
        "org.apache.spark.sql.delta.catalog.DeltaCatalog")
      .config("spark.sql.warehouse.dir", wh.toString)
      .getOrCreate()
    try f(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  test("snapshot / CDF / history / idle-window against a real Delta table") {
    withSession { spark =>
      val tbl = "graft_delta_e2e"
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      spark.sql(
        s"""CREATE TABLE $tbl (id BIGINT, v STRING) USING delta
           |TBLPROPERTIES (delta.enableChangeDataFeed = true)""".stripMargin)

      // commit 1: three inserts
      spark.sql(s"INSERT INTO $tbl VALUES (1,'a'), (2,'b'), (3,'c')")
      val src = DeltaChangeSource(spark, tbl)
      val afterC1 = src.latestCommitMs()
      assert(afterC1 > 0L, "latestCommitMs after first data commit")

      // ensure commit 2 lands on a strictly later millisecond
      Thread.sleep(1200)

      // commit 2: update id=2, delete id=3, insert id=4
      spark.sql(s"UPDATE $tbl SET v = 'B' WHERE id = 2")
      spark.sql(s"DELETE FROM $tbl WHERE id = 3")
      spark.sql(s"INSERT INTO $tbl VALUES (4,'d')")
      val afterAll = src.latestCommitMs()
      assert(afterAll > afterC1, "history advances with new commits")

      // snapshot between the commits = commit 1 exactly, all 'INSERT'
      val snap = src.snapshotAsOf(afterC1)
      assert(snap.columns.head == ChangeLog.MpChangeType)
      val snapRows = snap
        .select("id", ChangeLog.MpChangeType)
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(snapRows.toSeq ==
        Seq((1L, "INSERT"), (2L, "INSERT"), (3L, "INSERT")))

      // CDF over commit 2's window: pre/postimage mapping + net effect
      val changes = src.tableChanges(afterC1 + 1, afterAll)
      val byType = changes
        .select("id", ChangeLog.MpChangeType)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      assert(byType.toSeq == Seq(
        (2L, "DELETE"), // update_preimage
        (2L, "INSERT"), // update_postimage
        (3L, "DELETE"), // delete
        (4L, "INSERT"), // insert
      ))

      // idle window past the last commit: empty, full CDF schema
      val idle = src.tableChanges(afterAll + 1, afterAll + 60000)
      assert(idle.count() == 0L)
      val cols = idle.columns.toSet
      assert(cols.contains(ChangeLog.MpChangeType))
      assert(cols.contains(ChangeLog.ChangeType))
      assert(cols.contains(ChangeLog.CommitTs))
      assert(cols.contains("id") && cols.contains("v"))

      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
