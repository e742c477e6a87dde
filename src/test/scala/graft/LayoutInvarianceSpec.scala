package graft

/** Partition-layout invariance — the determinism property the oracle
  * hash-match cannot see (the driver always runs one fixed layout): a
  * query's RESULT must not depend on how the input happens to be split
  * or how many shuffle partitions the session runs. On a real cluster
  * both vary run to run (file sizes, AQE coalescing, executor count), so
  * any layout-sensitive result — an order-dependent double sum that
  * changes at the last ulp, a `first()` over an unordered group, a
  * nondeterministic tie-break — is a silent wrong-answer generator at
  * scale. Each case runs once under the suite layout (4 shuffle
  * partitions, default splits) and once under a deliberately different
  * one (7 shuffle partitions, 64 KiB max split → many more input
  * partitions) and must produce IDENTICAL rows.
  */
class LayoutInvarianceSpec extends SparkTestBase {

  // deliberately float-heavy and tie-prone picks alongside the core paths
  private val cases = Seq(
    "q_index_build", "q_tfidf_topk", "q_bm25_topk", "q_doc_similarity",
    "q_quality_deciles", "q_distribution_drift", "q_pmi_collocations",
    "q_robust_anomaly", "q_hourly_anomaly", "q_minhash_lsh", "q_simhash",
    "q_seq_packing", "q_epoch_shuffle", "q_pareto_frontier",
    "q5_region_revenue", "q_stratified_sample", "q_winnowing",
    "q_asof_broadcast", "q_top_terms_per_doc", "q_heavy_hitters",
    // native sketch: partial/merge must commute with any partitioning
    "q_vocab_kmv_native",
    // round-12 sketches: bottom-k partial/merge and KMV member algebra
    // must commute with any partitioning; SCD2's (ms, event_id) tie rule
    // must hold under any input split
    "q_sketch_quantiles", "q_range_shards", "q_vocab_overlap_native",
    "q_scd2_build", "q_join_size_est", "q_ivm_scd2",
    // closed-form regression: integer moments make the double solve
    // layout-proof — exactly the property this net exists to check
    "q_linear_model", "q_linear_grouped", "q_linear_outliers",
    "q_measured_join",
    // round-12 additions: integer-moment covariance, tie-broken top-k
    // over graph counts and rule lifts, NB integer scoring, and the MV
    // rewrite path (view partials must merge layout-independently)
    "q_embed_covariance", "q_copurchase_triangles", "q_basket_rules",
    "q_nb_predict", "q_mv_avg",
    // round-13: fixed-budget kNN vote ties, the PCA invariant row (its
    // grid collect reruns per layout), multi-view selection, and the
    // refreshed postings serve (merged cells must be layout-proof)
    "q_knn_classify", "q_pca_top", "q_mv_choose", "q_index_refresh",
    "q_embed_correlation", "q_label_centroids", "q_embed_drift",
    // round-14: ADC/cosine tie-break and prototype argmax must not depend
    // on partitioning; the centroid collect reruns per layout; the
    // struct-max mining ties and the micro-nat LM sums likewise
    "q_ivfpq_topk", "q_centroid_classify", "q_hard_negatives",
    "q_dsir_weights",
    // round-15: regex census counts and the PII-gated curation must not
    // depend on partitioning (row-local detection, integer counts);
    // filtered ANN shares the ivfpq tie-break obligations
    "q_pii_scrub", "q_pii_curate", "q_filtered_ann", "q_ivfpq_refresh",
    "q_scrub_report", "q_decontaminate", "q_ivf_cell_stats",
    "q_padding_report", "q_span_corruption", "q_dsir_select",
    "q_curation_funnel")

  private def rowsOf(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect().map(_.toString).toSeq.sorted
  }

  cases.foreach { name =>
    test(s"$name is invariant to shuffle-partition count and input splits") {
      val base = rowsOf(name)
      val conf = spark.conf
      val oldShuffle = conf.get("spark.sql.shuffle.partitions")
      val oldSplit = conf.get("spark.sql.files.maxPartitionBytes")
      conf.set("spark.sql.shuffle.partitions", "7")
      conf.set("spark.sql.files.maxPartitionBytes", "65536")
      try {
        val alt = rowsOf(name)
        assert(alt === base,
          s"$name result depends on partition layout")
        assert(base.nonEmpty)
      } finally {
        conf.set("spark.sql.shuffle.partitions", oldShuffle)
        conf.set("spark.sql.files.maxPartitionBytes", oldSplit)
      }
    }
  }
}
