package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Schema-evolution parquet read: a long-lived table directory
  * accumulates appends written under EVOLVING schemas — early files
  * lack columns that later files carry (the reference's `SELECT *`
  * export faces exactly this when the source table gains a column
  * between syncs). [[readMerged]] unions the per-file footer schemas
  * (`mergeSchema`, a footer-only pass — no data read) and then aligns
  * every row to one DECLARED schema with explicit casts, NULL-filling
  * columns that predate a file.
  *
  * The explicit `align` contract (name → Spark SQL type) is deliberate:
  * inferred union schemas drift with file arrival order for numeric
  * widenings, and a declared alignment makes the output schema a stable
  * function of the CALL, not of the directory state. At scale the
  * footer sweep is O(files) metadata reads (amortized by partition-level
  * manifests in a real lakehouse); the alignment itself is a narrow
  * codegen projection.
  */
object SchemaEvolution {

  def readMerged(spark: SparkSession, dir: String,
                 align: Seq[(String, String)]): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(dir)
    val have = raw.columns.toSet
    raw.select(align.map { case (name, tpe) =>
      (if (have(name)) col(name) else lit(null)).cast(tpe).as(name)
    }: _*)
  }
}
