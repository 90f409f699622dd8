package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Sync, SyncMode}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 (SURVEY §7.3): latest event
    * per user with non-null user_id and a computed row hash — scan →
    * filter → window top-1 → hash projection, the reference's full
    * composed slice (scd-latest + computed_hash_column).
    *
    * The SF dir honors SPARK_GRAFT_SF_DIR when set so the flagship can
    * exercise the same fixture the driver verifies (oracle twin:
    * q_entry_flagship, which always runs at the driver's SF); the
    * contract default stays sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val events = Tables.load(spark, sfDir, "events")
    val latest = Sync.plan(events,
      SyncMode.ScdLatest("user_id", "ts", keepRank = true, tieBreakers = Seq("event_id")),
      nonNullableCols = Seq.empty)
    operators.RowHash.withHashColumn(latest.filter(col("user_id").isNotNull),
      hashCol = "computed_hash")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
