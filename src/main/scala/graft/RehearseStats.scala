package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{Curriculum, Drift, Features}
import graft.functions.{QualityFilters, TextAnalysis}
import org.apache.spark.sql.functions._

/** Scale-rehearsal probe for the round's windowed-curation and
  * embedding-statistics operators (BASELINE.md "corpus-stats
  * rehearsal"): times, on a [[MakeScaleFixture]] directory,
  *
  *   - `Curriculum.qualityTopPercent` — the score + ONE-window shape;
  *   - `Features.quantileNormalize` — window + pooled-grid broadcast;
  *   - `Drift.withinGroupAlignment` — the (‖Σx‖² − Σ‖x‖²) one-pass
  *     identity over (group, component) sums;
  *   - `Drift.centroidSimMatrix` — same pass, pairwise on the folded
  *     groups frame;
  *
  * and prints one JSON line. Expectation at k× data: all four scale
  * ~linearly — the window operators because the group keys
  * (source/lang) bound partition width only by group size, the
  * embedding operators because everything after the (group, dim)
  * aggregate is metadata. A super-linear reading here means a window
  * lost its single-exchange shape or a fold went corpus-sized.
  *
  * Usage: `runMain graft.RehearseStats <fixtureDir>`.
  */
object RehearseStats {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RehearseStats <fixtureDir>")
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val nDocs = docs.count(); val nVecs = vecs.count()
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    val (nTop, sTop) = time(
      Curriculum.qualityTopPercent(docs, "text", "doc_id", "source", 30).count())
    val scored = docs
      .withColumn("_w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("source"),
        QualityFilters.classifierScoreOf(col("_w")).as("q_score"))
    val (nQn, sQn) = time(
      Features.quantileNormalize(scored, "doc_id", "source", "q_score").count())
    val (nAl, sAl) = time(
      Drift.withinGroupAlignment(vecs, "embedding", "label").count())
    val (nCs, sCs) = time(
      Drift.centroidSimMatrix(vecs, "embedding", "label").count())
    println(f"""{"docs":$nDocs,"vecs":$nVecs,"topp":{"rows":$nTop,"sec":$sTop%.2f},"qnorm":{"rows":$nQn,"sec":$sQn%.2f},"align":{"rows":$nAl,"sec":$sAl%.2f},"centsim":{"rows":$nCs,"sec":$sCs%.2f}}""")
    spark.stop()
  }
}
