package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Bpe

/** Scale-rehearsal probe for BPE merge learning (BASELINE.md): times
  * [[Bpe.learnMerges]] on a [[MakeScaleFixture]] documents corpus at
  * two multipliers. The expected shape: the initial word-type aggregate
  * is the only corpus-sized stage (one scan, linear), and every merge
  * round after it works on the VOCABULARY — which saturates on any
  * natural corpus — so total time should grow far sub-linearly with
  * corpus size. A near-linear growth here means a corpus-sized stage
  * leaked into the merge loop.
  *
  * Usage: `runMain graft.RehearseBpe <docsDir> [k]`
  */
object RehearseBpe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseBpe <docsDir> [k]")
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 6
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val merges = Bpe.learnMerges(docs, "text", k = k, maxWordLen = 20)
    val n = merges.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"docs":$nDocs,"k":$k,"merges":$n,"sec":$sec%.2f}""")
    spark.stop()
  }
}
