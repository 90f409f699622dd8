package graft

// Throwaway stage profiler for q_pipeline_prep — not part of the
// library surface; delete after use.
object ProfPrep {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions.TextAnalysis
    import graft.operators.Dedup
    val spark = Engine.session("local[32]", 32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (iter <- 1 to 2) {
      println(s"--- iter $iter")
      val docs = Tables.load(spark, d, "documents")
      val scored = Dedup.rebalance(docs)
        .withColumn("_w", TextAnalysis.tokens(col("text")))
        .withColumn("lang_pred", TextAnalysis.langIdOf(col("_w")))
        .withColumn("quality", TextAnalysis.qualityScoreOf(col("text"), col("_w")))
        .withColumn("n_tokens", TextAnalysis.tokenCountOf(col("_w")))
        .filter(col("lang_pred") === "en" && col("quality") >= 0.75)
        .drop("_w")
      time("scored")(scored.count())
      val exact = Dedup.exact(scored, "text", "doc_id")
      time("exact")(exact.count())
      val pairs = Dedup.minhashLshPairs(exact, "text", "doc_id", 3, 42, 3, 0.5)
      time("pairs")(pairs.count())
      val resolved = Dedup.resolvePairs(exact, pairs, "doc_id")
      time("resolve")(resolved.count())
    }
    spark.stop()
  }
}
