package graft

/** Partitioning-independence for the round-2 operators: the answer must be
  * bit-identical whether the plan runs in 1 task or many — the property that
  * lets the same code run at sf0.001 and at 100 TB. (Round-1 queries carry
  * the same guarantee via the Verify determinism probe at
  * SPARK_GRAFT_CPUS ∈ {4, 8, 32}.)
  */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val queries = Seq("q66_corpus_mix", "q67_dup_clusters",
    "q68_interval_bucketed", "q69_tfidf_topterms", "q70_cdc_compact",
    "q71_repetition_quality", "q72_dedup_pipeline", "q75_sequence_packing",
    "q76_decontamination", "q77_cube", "q78_knn_join",
    "q79_percentile_truncation", "q81_set_ops", "q82_zscore_outliers",
    "q83_batch_sessionize", "q84_calibration", "q85_normalize",
    "q87_sql_surface", "q88_decile_binning", "q89_integrity_audit",
    "q90_salted_join", "q91_time_weighted_avg", "q92_resample_ffill",
    "q93_star_join", "q94_unpivot", "q95_feature_corr", "q96_fuzzy_match",
    "q97_token_lm", "q98_char_diversity", "q99_mad_outliers",
    "q100_chi_square", "q101_weighted_median", "q102_funnel",
    "q103_cohort_retention", "q104_column_profile",
    "q109_token_budget_mix", "q110_gap_detect", "q111_ar1_forecast",
    "q112_skew_report", "q113_psi_drift", "q114_markov_transitions",
    "q115_ks_two_sample", "q116_cohen_kappa", "q117_bloom_semijoin",
    "q118_pagerank", "q119_rolling_backtest", "q120_benford_audit",
    "q121_ab_ztest", "q122_kaplan_meier", "q123_cms_heavy_hitters",
    "q124_int8_quantization", "q125_bucketed_join", "q126_isotonic_calibration",
    "q127_cooccurrence",
    "q128_record_linkage", "q129_median_no_sort", "q130_top_paths",
    "q132_zorder_skipping", "q133_bigram_perplexity", "q134_snapshot_diff",
    "q135_priority_sample", "q136_join_cardinality", "q137_changepoint",
    "q139_triangle_census", "q140_zipf_fit", "q141_quantile_norm",
    "q142_incremental_agg", "q144_frequent_motifs",
    "q146_sql_dedup", "q147_sql_funnel", "q148_sql_drift",
    "q149_sql_sessionize", "q150_partition_pruning", "q151_spearman",
    "q152_mutual_info", "q153_sql_ann", "q154_sql_star_join",
    "q156_compaction", "q157_schema_evolution", "q158_dead_letter",
    "q159_content_fingerprint", "q160_curation_pipeline",
    "q161_bm25_retrieval", "q162_portable_hll", "q163_lsh_buckets",
    "q164_ewma", "q165_token_chunks", "q166_hybrid_rrf", "q167_sql_bm25",
    "q168_containment", "q170_vocab_build", "q171_ngram_langid",
    "q172_mixture_weights", "q173_source_overlap", "q174_rolling_zscore",
    "q175_quality_gate", "q176_seasonal_strength", "q177_js_divergence",
    "q178_cuped_ab", "q179_negative_samples", "q180_conformal",
    "q181_canonical_by_quality", "q182_ivf_portable",
    "q183_ridge_closed_form", "q185_boilerplate_ngrams",
    "q186_embedding_diversity", "q187_ridge_grid_portable",
    "q188_semdedup_portable", "q189_irls_logistic",
    "q190_hll_intersection", "q191_power_iteration_pca",
    "q192_irls_weighted", "q193_pq_portable", "q194_boosted_stumps",
    "q195_multitask_portable", "q196_lasso_cd", "q197_calibration_card",
    "q198_winnowing_neardup", "q199_active_selection", "q200_mlp_forward",
    "q201_quantile_sketch", "q203_gaussian_nb", "q204_chi2_tokens",
    "q205_knn_classify", "q206_bloom_fp_card", "q207_contamination",
    "q208_mad_outliers", "q209_stratified_sample",
    "q210_correlation_matrix", "q211_woe_iv", "q212_unigram_perplexity",
    "q214_label_propagation", "q215_target_encoding",
    "q216_incremental_dedup", "q217_k_anonymity", "q218_rerandomization",
    "q219_kcenter_coreset", "q220_ann_recall", "q223_retrieval_eval",
    "q224_platt_calibration", "q225_verified_pairs")
  // q202/q213/q221/q222 are streaming (batch≡stream convergence specs
  // cover them)
  // q145 joins the MLlib exclusion list (L-BFGS trajectory depends on the
  // coalesced treeAggregate order, like q29/q47)
  // q155 joins the MLlib exclusion list (GBT tree builds, like q42/q59)
  // q143 PQ joins the MLlib exclusion list (seeded k-means codebooks)
  // q138 joins the sketch exclusion list (HLL estimates, like q53/q107)
  // q131 is streaming (the streaming family stays under its own
  // convergence specs, like q38/q73); q184 likewise (its convergence spec
  // additionally pins multi-batch invariance)
  // q126 isotonic is INCLUDED despite being an MLlib fit: the PAV
  // fixpoint is the unique isotonic solution, so per-partition pooling +
  // driver merge lands on the same boundaries under any partitioning
  // q74/q80 are excluded: k-means initialization samples per-partition, so
  // their (seeded) result is deterministic per partitioning, not across
  // partitionings — the documented contract for MLlib-backed queries
  // (q105-q107 likewise: MLlib fits / HLL sketch estimates)

  test("round-2+ queries are bit-identical at shuffle.partitions 1 and 7") {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      queries.foreach { name =>
        val fn = SparkEntry.queries(name)
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        val one = fn(spark, dir).collect().map(_.toSeq).toSeq
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        val many = fn(spark, dir).collect().map(_.toSeq).toSeq
        assert(one == many, s"$name differs across partitionings")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
