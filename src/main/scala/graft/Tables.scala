package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-directory "catalog": the local stand-in for the reference's
  * Unity-Catalog 3-level table refs (`{catalog}.{schema}.{table}`,
  * export.py:137). A scale-factor directory holds one parquet file per
  * table (TESTDATA.md).
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects
      // ([PARQUET_TYPE_ILLEGAL]). Read it as a ns-epoch long and truncate
      // to a µs TimestampType — lossless for this data (values are µs
      // precision) and matching DuckDB's CAST(ts AS TIMESTAMP).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NB: integer division — `col/1000` would go through DOUBLE and lose
      // precision on ns-epoch longs (observed off-by-1µs).
      spark.read.parquet(s"$sfDir/$name.parquet").withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` queries (the
    * reference's only query surface, export.py:203) resolve names the
    * same way the DuckDB oracle does.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
