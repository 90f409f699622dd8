package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{QualityFilters, TextAnalysis}

/** Micro-probe for the GopherCounts conversion (r14): times (a) one
  * feature (one native counts pass), (b) all four features (four
  * counts subtrees — CSE should fold them to one pass), and (c) the
  * prior HOF formulations, over the documents fixture. Decides whether
  * whole-stage codegen's subexpression elimination actually dedups the
  * counts and whether the native pass beats the HOF path at fixture
  * doc lengths. Usage: `runMain graft.RehearseGopher <sfDir> [iters]`.
  */
object RehearseGopher {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val iters = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select(col("text"))
      .cache()
    docs.count()
    val w = TextAnalysis.tokens(col("text"))

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        mk.agg(sum(col("x"))).head()
        println(f"[gopher] $label%-18s pass $i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }

    time("native_one") { docs.select(QualityFilters.meanWordLenOf(w).as("x")) }
    time("native_four") { docs.select((QualityFilters.meanWordLenOf(w) +
      QualityFilters.uniqWordRatioOf(w) + QualityFilters.topWordRatioOf(w) +
      QualityFilters.dup2gramRatioOf(w)).as("x")) }
    time("hof_four") { docs.select((QualityFilters.meanWordLenOfHof(w) +
      QualityFilters.uniqWordRatioOfHof(w) + QualityFilters.topWordRatioOfHof(w) +
      QualityFilters.dup2gramRatioOfHof(w)).as("x")) }
    time("native_classifier") { docs.select(
      QualityFilters.classifierScoreOf(w).as("x")) }
    spark.stop()
  }
}
