package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{QualityFilters, TextAnalysis}
import graft.operators.Curriculum

/** Scale-rehearsal probe for token-budget selection (BASELINE.md
  * "Token-budget selection scale rehearsal"): times the bucketed
  * two-phase plan against the naive global-sort/running-total statement
  * of the same semantics on a [[MakeScaleFixture]] corpus, and checks
  * they select the identical document set. The interesting number is
  * the growth RATIO from 1× to 10× — the bucketed path must scale like
  * a scan, the naive path carries a corpus-wide range exchange + sort.
  *
  * Usage: `runMain graft.RehearseBudget <docsDir> <budget> [bucketed|naive|both]`
  */
object RehearseBudget {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: RehearseBudget <docsDir> <budget> [mode]")
    val dir = args(0)
    val budget = args(1).toLong
    val mode = if (args.length > 2) args(2) else "both"
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
    // the semantics stated naively: global (score desc, id) running
    // total — correct, and exactly what the operator must never plan
    def naive() = {
      val w = Window.orderBy(col("q_score").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("_w", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"),
          QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
          TextAnalysis.tokenCountOf(col("_w")).as("n_tokens"))
        .withColumn("_cum", sum(col("n_tokens")).over(w))
        .filter(col("_cum") <= budget)
    }
    def scored() = docs.withColumn("_w", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        QualityFilters.classifierScoreOf(col("_w")).as("q_score"),
        TextAnalysis.tokenCountOf(col("_w")).as("n_tokens"))
    if (mode == "score") {
      val (n, sec) = time(scored().count())
      println(f"""{"mode":"score","rows":$n,"sec":$sec%.2f}""")
    }
    if (mode == "ckpt") {
      val (df, sec) = time(scored().localCheckpoint())
      println(f"""{"mode":"ckpt","sec":$sec%.2f}""")
      val (n, sec2) = time(df.count())
      println(f"""{"mode":"ckpt-read","rows":$n,"sec":$sec2%.2f}""")
    }
    if (mode == "plan") {
      val df = Curriculum.tokenBudgetSelect(docs, "text", "doc_id", budget)
      df.collect()
      println(df.queryExecution.executedPlan.toString())
    }
    var kept = -1L
    if (mode == "bucketed" || mode == "both") {
      val (n, sec) = time(
        Curriculum.tokenBudgetSelect(docs, "text", "doc_id", budget).count())
      kept = n
      println(f"""{"mode":"bucketed","kept":$n,"sec":$sec%.2f}""")
    }
    if (mode == "naive" || mode == "both") {
      val (n, sec) = time(naive().count())
      println(f"""{"mode":"naive","kept":$n,"sec":$sec%.2f}""")
      if (kept >= 0 && n != kept)
        sys.error(s"bucketed/naive disagree: $kept vs $n")
    }
    spark.stop()
  }
}
