package graft

/** Empty-relation degradation — the 100 TB edge case the small-SF suite
  * never hits by accident: a date partition with no files, a filter that
  * matches nothing, a tenant with zero documents. Every operator must
  * degrade to an EMPTY (or empty-compatible aggregate) result with the
  * declared schema, never throw. This spec stages a zero-row twin of the
  * full table set (schemas copied from sf0.001 via limit 0) and runs a
  * representative query per module against it.
  */
class EmptyInputSpec extends SparkTestBase {

  private lazy val emptySf: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_empty_sf").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  // one representative per module; queries whose SEMANTICS require rows
  // (round-trip proofs that write-then-read their own output) are
  // exercised by the main suite and excluded here by design
  private val cases = Seq(
    "q_index_build",      // indexer: tokenize → agg → range sink plan
    "q_term_lookup",      // serve path over an empty index
    "q_vocab_stats",      // distinct agg
    "q_exact_dedup",      // dedup keeper rule
    "q_minhash_lsh",      // signatures of an empty shingle relation
    "q_simhash",          // simhash signatures
    "q_cosine_topk",      // similarity over empty embeddings
    "q_quality_score",    // row-local scoring
    "q_langid",           // language id
    "q_pareto_frontier",  // two-phase skyline
    "q_pmi_collocations", // bigram PMI
    "q_token_counts",     // BPE-ish token counting
    "q_seq_packing",      // distributed prefix sum over zero docs
    "q_hourly_rollup",    // event-time agg
    "q_hourly_anomaly",   // trailing-window stats
    "q_robust_anomaly",   // median/MAD twin
    "q_sessionize",       // stateful batch sessionization
    "q_asof_purchase_view", // union+window as-of
    "q_asof_native",      // custom merge exec on empty partitions
    "q_asof_broadcast",   // broadcast exec with an empty broadcast index
    "q_range_join",       // binned interval join
    "q_funnel",           // multi-stage funnel
    "q1_pricing",         // TPC-H agg
    "q5_region_revenue",  // TPC-H join chain
    "q_table_profile",    // ANALYZE-style profile (aggregate row is legal)
    "q_constraint_audit", // rule table over empty inputs (rule rows legal)
    "q_distribution_drift", // PSI cells
    "q_stratified_sample",  // hash keep rule
    "q_quota_cap",        // per-source quota
    "q_mixture_cube",     // grouping-sets tile
    "q_chunk_documents",  // context-window chunking
    "q_pii_mask",         // row-local masking
    "q_vocab_kmv_native", // native sketch aggregate over zero rows
    "q_streaming_asof",   // foreachBatch drain of an empty feed
    "q_linear_model",     // closed-form solve of zero-row moments
    "q_linear_grouped",   // per-group moments over zero groups
    "q_linear_outliers",  // scoring under an empty (null-beta) model
    "q_measured_join",    // measured decision on an empty dimension
    // round-13 additions: moment grids, prototypes, eigen report and the
    // fixed-budget kNN must all degrade to empty, not crash
    "q_embed_covariance",
    "q_embed_correlation",
    "q_label_centroids",
    "q_knn_classify",
    "q_pca_top",
    "q_embed_drift",
    // round-14: the composed IVF-PQ serve (empty index artifact), the
    // prototype classifier (zero prototypes → empty confusion matrix),
    // mining over zero queries, LM weights over zero docs
    "q_ivfpq_topk",
    "q_centroid_classify",
    "q_hard_negatives",
    "q_dsir_weights",
    // round-15: PII census and the PII-gated curation over zero docs;
    // filtered ANN over an empty codes artifact
    "q_pii_scrub",
    "q_pii_curate",
    "q_filtered_ann",
    "q_ivfpq_refresh",
    "q_scrub_report",
    "q_decontaminate",
    "q_ivf_cell_stats",
    "q_padding_report",
    "q_span_corruption",
    "q_dsir_select",
    "q_curation_funnel")

  cases.foreach { name =>
    test(s"$name degrades to an empty-compatible result on zero-row tables") {
      val df = SparkEntry.queries(name)(spark, emptySf)
      val rows = df.collect() // must not throw
      assert(df.columns.nonEmpty)
      // global-aggregate / rule-table shapes legitimately emit summary
      // rows over empty inputs (the funnel reports its 3 stages with
      // n = 0); everything else must be exactly empty
      val aggregateShaped =
        Set("q_table_profile", "q_constraint_audit", "q_mixture_cube",
          "q_funnel",
          // the global moments row exists (n=0, null betas) even with
          // zero input rows — the 1-row-report shape
          "q_linear_model",
          // the funnel's single cumulative-counts row exists at n_raw=0
          "q_curation_funnel")
      if (!aggregateShaped.contains(name))
        assert(rows.isEmpty,
          s"$name returned ${rows.length} rows from zero-row inputs")
    }
  }
}
