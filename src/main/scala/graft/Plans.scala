package graft
import java.nio.file.{Files, Paths}
/** Diagnostic main: dumps `explain("formatted")` for the headline
  * queries to target/plans.txt — the plan-audit loop behind BASELINE.md.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[4]", 4)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = Seq("q_time_based", "q_join_revenue", "q_scd_latest", "q_scd_latest_maxby",
      "q_ann_bruteforce", "q_dedup_minhash_lsh", "q_dedup_exact", "q_topk_orders", "q_mm_decode",
      "q_funnel", "q_dedup_embedding_lsh", "q_dedup_simhash", "q_ann_ivf", "q_sessionize",
      "q_pipeline_prep", "q_emb_quantize", "q_asof_join", "q_range_join",
      "q_quality_gopher", "q_decontaminate", "q_chunk_dedup", "q_pii_redact",
      "q_split_assign", "q_stratified_sample", "q_seq_pack", "q_idf_score",
      "q_pipeline_curate", "q_ann_ivf_kmeans",
      "q_hll_distinct", "q_cms_topk", "q_tfidf_pairs", "q_rolling_daily", "q_mm_phash",
      "q_bloom_prune", "q_skew_join", "q_perplexity", "q_mixture_weights",
      "q_len_quantiles",
      "q_kmv_jaccard", "q_pmi_colloc", "q_cube_stats", "q_group_sample",
      "q_incr_dedup", "q_ngram_novelty",
      "q_boilerplate_strip", "q_winnow_overlap", "q_rand_proj", "q_pca_power",
      "q_source_drift", "q_quality_classifier", "q_dup_span",
      "q_row_hash", "q_entry_flagship", "q_quality_bins", "q_dedup_edit",
      "q_dedup_keepbest", "q_passage_chunk", "q_epoch_shuffle",
      "q_ann_topk_agg", "q_pipeline_spans",
      // round-11 continuation headliners
      "q_quality_topp", "q_quantile_norm", "q_bootstrap_ci",
      "q_mahalanobis", "q_adamic_adar", "q_emb_alignment",
      "q_confident_joint", "q_isotonic",
      // round-16 tiered oracle twins
      "q_scd_latest_tiered", "q_scd_latest_keys", "q_cdc_sync_tiered",
      "q_dedup_minhash_tiered", "q_hll_tiered")
    val sb = new StringBuilder
    names.foreach { n =>
      sb.append(s"\n========== $n ==========\n")
      try {
        val df = SparkEntry.queries(n)(spark, d)
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable => sb.append("ERROR " + e) }
    }
    Files.writeString(Paths.get("target/plans.txt"), sb.toString)
    println("WROTE target/plans.txt")
    spark.stop()
  }
}
