package graft

import org.apache.spark.sql.SparkSession

import graft.operators.SharedSubstrings

/** Scale-rehearsal probe for exact shared-substring mining
  * (BASELINE.md): times [[SharedSubstrings.topShared]] on a
  * [[MakeScaleFixture]] documents corpus. Expected shape: the suffix
  * explosion and the prefix-bucket exchange are both linear in corpus
  * characters (cap× the bytes), and per-bucket sorts are
  * n·log(bucket) — so total time should grow roughly linearly with
  * corpus size. Super-linear growth means a hot prefix bucket outgrew
  * the cap's protection (raise prefixLen or lower maxBucketSize).
  *
  * Usage: `runMain graft.RehearseShared <docsDir> [prefixLen]`
  */
object RehearseShared {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseShared <docsDir> [prefixLen]")
    val prefixLen = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"${args(0)}/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val n = SharedSubstrings.topShared(docs, "text", "doc_id",
      prefixLen = prefixLen).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"docs":$nDocs,"prefixLen":$prefixLen,"spans":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
