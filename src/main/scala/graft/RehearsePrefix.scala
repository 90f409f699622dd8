package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Scale-rehearsal probe for the prefix-join regime router (BASELINE.md
  * "Prefix-join (PPJoin) scale rehearsal"): times the EXACT prefix join
  * vs the AUTO-routed variant on a [[MakeScaleFixture]] documents
  * corpus and prints one JSON line per variant. The closed 31-word
  * vocabulary saturates the shingle space, so the router must measure
  * its way off the exact path here; on the natural driver fixture it
  * must stay exact (gated by q_dedup_prefix).
  *
  * Usage: `runMain graft.RehearsePrefix <docsDir> [exact|auto|stats]...`
  * (docsDir contains documents.parquet; default runs stats+auto).
  */
object RehearsePrefix {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearsePrefix <docsDir> [exact|auto|stats]...")
    val dir = args(0)
    val modes = if (args.length > 1) args.drop(1).toSeq else Seq("stats", "auto")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    modes.foreach {
      case "stats" =>
        val ((nDocs, cand), sec) = time(
          Dedup.prefixCandidateStats(docs, "text", "doc_id", n = 3, threshold = 0.5))
        println(f"""{"mode":"stats","docs":$nDocs,"candidates":$cand%.0f,"perDoc":${cand / math.max(nDocs, 1)}%.1f,"sec":$sec%.2f}""")
      case "exact" =>
        val (n, sec) = time(
          Dedup.prefixJaccardPairs(docs, "text", "doc_id", n = 3, threshold = 0.5).count())
        println(f"""{"mode":"exact","pairs":$n,"sec":$sec%.2f}""")
      case "auto" =>
        val ((df, exact), sec0) = time(Dedup.prefixJaccardPairsRouted(
          docs, "text", "doc_id", n = 3, threshold = 0.5))
        val (n, sec1) = time(df.count())
        println(f"""{"mode":"auto","routedExact":$exact,"pairs":$n,"sec":${sec0 + sec1}%.2f}""")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
