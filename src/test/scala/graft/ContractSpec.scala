package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver contract: every operator key committed in SURVEY.md §2B
  * exists in SparkEntry.queries, module maps don't collide, and every
  * oracle entry has a query.
  */
class ContractSpec extends AnyFunSuite {

  /** The §2B inventory (SURVEY.md) — one key per row. */
  val surveyKeys: Set[String] = Set(
    "q_scan_parquet", "q_scan_pruned", "q_sink_partitioned",
    "q_filter_predicate", "q_project_expr",
    "q_join_broadcast", "q_join_shuffle", "q_join_multiway",
    "q_join_semi_anti", "q_join_outer", "q_join_asof_range",
    "q_agg_hash", "q_agg_distinct", "q_agg_rollup_cube", "q_agg_custom_typed",
    "q_window_rank", "q_window_running", "q_window_range_frame",
    "q_sort_limit", "q_topk", "q_set_ops", "q_dedup_exact",
    "q_scalar_string", "q_scalar_datetime", "q_scalar_math", "q_scalar_json",
    "q_scalar_array", "q_udf_scalar", "q_udtf_explode", "q_text_stats",
    "q_dedup_near", "q_simsearch_topk", "q_multimodal_join",
    "q_stream_tumbling", "q_stream_sliding_session", "q_stream_watermark_late",
    "q_stream_session_window", "q_stream_stateful", "q_pipeline_ingest",
    "q_transfer_file")

  /** North-star additions beyond §2B (training-data pipeline operators). */
  val extraKeys: Set[String] = Set(
    "q_dedup_ngram", "q_dedup_simhash", "q_dedup_embed", "q_simsearch_ivf",
    "q_multimodal_binary", "q_multimodal_frames", "q_multimodal_frames_sigs",
    "q_text_langid", "q_text_quality", "q_text_tokens", "q_text_fingerprint",
    "q_ingest_json", "q_agg_cube", "q_source_json_roundtrip",
    "q_dedup_survivors", "q_stream_dedup", "q_agg_approx_distinct",
    "q_agg_percentile", "q_pivot_wide", "q_stream_join_interval",
    "q_source_csv_roundtrip", "q_source_orc_roundtrip",
    "q_unpivot_long", "q_join_bucketed", "q_join_skew_salted",
    "q_corpus_filter", "q_stream_sink_files",
    "q_window_ntile", "q_agg_stats", "q_subquery", "q_agg_collect",
    "q_scalar_null", "q_pack_sequences", "q_sample_stratified",
    "q_multimodal_audio", "q_upsert_partition",
    "q_text_repetition", "q_text_unigram_lp", "q_corpus_domain_cap",
    "q_dedup_cluster", "q_simsearch_ivf_full", "q_simsearch_append",
    "q_simsearch_delete", "q_simsearch_stream_append", "q_simsearch_filtered",
    "q_simsearch_hybrid", "q_stream_join_outer",
    "q_agg_grouped_fit", "q_source_corrupt_tolerant", "q_stream_stateful_tws",
    "q_embed_quantize", "q_text_pii_scrub",
    "q_embed_pq", "q_simsearch_pq_adc", "q_dedup_incremental",
    "q_simsearch_ivfpq", "q_simsearch_ivfpq_full", "q_simsearch_batch",
    "q_simsearch_rerank", "q_simsearch_batch_rerank", "q_dedup_simhash_verified",
    "q_dedup_embed_verified",
    "q_source_xml_roundtrip", "q_stream_foreach_upsert",
    "q_agg_sketch_merge", "q_agg_histogram_merge", "q_layout_zorder",
    "q_maintain_compact", "q_maintain_delete", "q_text_containment",
    "q_agg_heavy_hitters", "q_join_bloom_pruned", "q_maintain_scd2",
    "q_scan_manifest_skip", "q_text_tfidf", "q_embed_kmeans_step",
    "q_agg_incremental", "q_sample_hash", "q_stream_topk",
    "q_text_bpe_step", "q_funnel_steps", "q_source_schema_evolution",
    "q_analyze_stats", "q_sql_recursive", "q_scalar_variant",
    "q_reconcile_diff", "q_dq_rules", "q_anomaly_zscore", "q_cdc_apply",
    "q_graph_pagerank_step", "q_timeseries_gapfill", "q_join_range_bucket",
    "q_text_collocation_pmi", "q_window_gaps_islands",
    "q_agg_retention_cohort", "q_maintain_clone",
    "q_agg_active_users", "q_topk_per_key",
    "q_maintain_vacuum", "q_scan_time_travel", "q_join_dpp",
    "q_corpus_mix_temperature", "q_text_inverted_index",
    "q_embed_norm_audit", "q_graph_triangles",
    "q_corpus_contamination", "q_text_entropy", "q_window_first_last",
    "q_interval_active_peak", "q_agg_mode_exact", "q_agg_weighted_median",
    "q_window_drawdown", "q_dq_benford", "q_embed_pca_power",
    "q_timeseries_ohlc", "q_agg_gini", "q_scd2_snapshot", "q_sql_lateral",
    "q_join_asof_tolerance", "q_text_hash_vectorizer", "q_corpus_boilerplate",
    "q_join_nullsafe", "q_agg_cms_merge", "q_anomaly_mad",
    "q_window_rolling_median", "q_join_null_aware_anti", "q_text_zipf",
    "q_skyline_pareto", "q_window_ewma", "q_text_bigram_lp",
    "q_scalar_decimal", "q_interval_merge", "q_window_rsi",
    "q_privacy_kanon", "q_timeseries_seasonal", "q_window_bollinger",
    "q_sample_weighted", "q_graph_bfs", "q_join_spatial_grid",
    "q_corpus_mix_epochs", "q_dedup_url",
    "q_text_chunk", "q_shuffle_shard", "q_dedup_semantic", "q_search_bm25",
    "q_dq_drift", "q_embed_project", "q_text_classify",
    "q_basket_lift", "q_agg_rfm", "q_event_transition", "q_join_fuzzy_name",
    "q_dq_referential", "q_seq_match", "q_survival_hazard",
    "q_agg_hll_overlap", "q_agg_approx_quantile", "q_text_lexical",
    "q_source_text_roundtrip", "q_graph_degree_stats", "q_agg_cohort_ltv",
    "q_event_sessionize", "q_agg_corr_matrix", "q_timeseries_interpolate",
    "q_timeseries_autocorr", "q_anomaly_cusum", "q_graph_common_neighbors",
    "q_agg_concentration", "q_window_beta", "q_timeseries_decompose",
    "q_agg_var_cvar", "q_event_attribution", "q_agg_hhi",
    "q_graph_kcore_peel", "q_sql_grouping_sets", "q_agg_bitmap_distinct",
    "q_funnel_latency", "q_timeseries_growth", "q_window_lag_features",
    "q_sample_balanced", "q_event_trigrams", "q_privacy_ldiversity",
    "q_timeseries_anomaly_stl", "q_join_asof_nearest", "q_agg_ab_test",
    "q_scalar_rowhash", "q_stream_join_static", "q_event_attribution_decay",
    "q_dedup_sweep", "q_agg_ab_cuped", "q_graph_modularity", "q_scalar_dense_ids",
    "q_simsearch_compact", "q_simsearch_append_delete", "q_simsearch_batch_routed",
    "q_simsearch_drift", "q_simsearch_reclaim", "q_simsearch_cell_stats",
    "q_graph_connected_components", "q_stream_cdc_apply",
    "q_simsearch_retrain", "q_simsearch_rebuild", "q_stream_scd2",
    "q_graph_louvain_step", "q_graph_community_contract",
    "q_text_substring_dedup", "q_text_chunk_cdc", "q_text_rake",
    "q_text_oov_rate", "q_graph_clustering_coeff", "q_graph_label_prop",
    "q_graph_adamic_adar", "q_simsearch_mmr", "q_simsearch_matryoshka",
    "q_stream_anomaly", "q_privacy_dp_count", "q_timeseries_mann_kendall",
    "q_simsearch_binary", "q_stream_pattern",
    // round 12 (this session): analytics/curation/lifecycle additions
    "q_text_gopher_rules", "q_graph_hits_step", "q_agg_ks_test",
    "q_privacy_dp_sum", "q_timeseries_changepoint", "q_corpus_dsir",
    "q_window_macd", "q_window_stochastic", "q_graph_assortativity",
    "q_text_heaps", "q_simsearch_range", "q_privacy_dp_topk",
    "q_timeseries_backtest", "q_agg_chisq", "q_join_interval_overlap",
    "q_agg_moments", "q_graph_powerlaw", "q_event_interarrival",
    "q_dq_freshness", "q_stream_window_distinct", "q_event_stickiness",
    "q_window_sharpe", "q_embed_centroid_eval", "q_corpus_token_budget",
    "q_simsearch_maxsim", "q_maintain_restore", "q_event_audience_overlap",
    "q_text_novelty", "q_window_atr", "q_agg_raking_step",
    "q_scan_observed", "q_join_asof_forward", "q_agg_delta_method",
    "q_embed_hard_negatives", "q_sample_systematic",
    "q_stream_complete_agg", "q_text_watermark", "q_anomaly_iqr",
    "q_stream_update_agg", "q_embed_triplet_margin", "q_agg_mix_entropy",
    "q_event_segment_migration", "q_window_streak",
    "q_graph_butterflies", "q_agg_mann_whitney",
    "q_corpus_split_leakage", "q_event_markov_step", "q_scalar_url_parse",
    // round 13: web-corpus front door + image dedup + tokenizer end-to-end
    "q_text_html_extract", "q_dedup_image_phash",
    "q_text_bpe_train", "q_text_bpe_encode", "q_simsearch_nsw",
    "q_simsearch_hnsw", "q_dedup_lines", "q_corpus_funnel_audit",
    "q_text_wordpiece_encode", "q_corpus_dataset_card",
    "q_embed_kmeans_train", "q_corpus_decontaminate",
    "q_multimodal_pair_dedup", "q_stream_corpus_curate",
    "q_simsearch_nsw_batch", "q_rag_index_retrieve", "q_timeseries_ses",
    // round 14: lifecycle + inference-seam + trained-gate + audio dedup
    "q_simsearch_nsw_insert", "q_embed_infer_arrow", "q_dedup_audio_fp",
    "q_text_classify_train", "q_simsearch_nsw_delete",
    "q_simsearch_nsw_compact", "q_privacy_tclose", "q_dedup_bloom",
    "q_text_unigram_encode", "q_multimodal_video_scene",
    "q_text_kneser_ney", "q_embed_whiten", "q_corpus_curriculum",
    "q_agg_bootstrap_ci", "q_simsearch_recall_eval", "q_agg_winsorize",
    "q_scan_bloom_skip", "q_multimodal_audio_segments",
    "q_text_unigram_em_step", "q_multimodal_keyframe", "q_agg_mde_power",
    "q_text_kn_perplexity",
    // round 15: best-fit packing + SCC + forecasting + multimodal funnel
    "q_pack_best_fit", "q_graph_scc", "q_timeseries_holt_winters",
    "q_multimodal_align", "q_stream_video_scene", "q_layout_hilbert",
    "q_corpus_reweight", "q_seq_prefixspan", "q_graph_random_walk",
    "q_timeseries_dtw", "q_stream_join_multiway", "q_interval_allen",
    "q_privacy_dp_quantile", "q_join_rank", "q_graph_coreness",
    "q_graph_louvain_level2", "q_source_gzip_roundtrip",
    // round 16: declarative lake MERGE + iterative-graph closures +
    // streaming full-outer + biased walks + image gate
    "q_maintain_merge", "q_graph_pagerank_full", "q_stream_join_full_outer",
    "q_graph_node2vec_walk", "q_multimodal_image_filter",
    "q_graph_louvain_full", "q_maintain_mv_refresh", "q_privacy_local_dp",
    "q_stream_join_asof", "q_search_phrase", "q_graph_ppr",
    "q_timeseries_crosscorr",
    // round 17: persisted quantile partials + centrality/truss closures +
    // the ER funnel + AR(p) forecasting + the OPQ rotation step
    "q_agg_quantile_sketch_merge", "q_graph_betweenness", "q_graph_ktruss",
    "q_er_resolve", "q_timeseries_ar", "q_simsearch_opq", "q_graph_mst",
    "q_stream_quantile_sketch",
    // round 18: the cell-bounded NN-Descent graph construction (the r17
    // judge's single `weak` item made a first-class oracle-checked key),
    // sampled harmonic closeness
    "q_simsearch_nsw_build", "q_graph_closeness", "q_graph_sssp",
    "q_simsearch_nsw_recall", "q_agg_theta_sketch_diff",
    "q_timeseries_seasonal_ar", "q_graph_neighborhood",
    "q_stream_theta_sketch", "q_graph_landmark_dist",
    "q_graph_cc_incremental", "q_stream_hll_sketch")

  test("every SURVEY.md §2B key is implemented") {
    val missing = surveyKeys -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"unimplemented §2B keys: $missing")
  }

  test("the full inventory is exactly §2B plus the declared extras") {
    assert(SparkEntry.queries.keySet === surveyKeys ++ extraKeys)
  }

  test("module query maps do not shadow each other") {
    val sizes = Seq(operators.Relational.queries.size, operators.Scalars.queries.size,
      operators.LlmData.queries.size, streaming.Streams.queries.size,
      sources.PipelineIngest.queries.size, sources.Transfer.queries.size,
      operators.Quality.queries.size, operators.Analytics.queries.size)
    assert(sizes.sum === SparkEntry.queries.size, "duplicate keys across modules")
  }

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without a query: $orphans")
  }

  test("oracle coverage is complete for the deterministic surface") {
    // only probabilistic/hash-defined/approximate/side-effect queries may
    // skip the DuckDB oracle (SURVEY.md §2B oracle column)
    // exactly the probabilistic / hash-defined / engine-specific-sampling
    // queries; everything else (incl. q_text_langid and q_sink_partitioned,
    // once listed here) carries a DuckDB oracle
    // q_dedup_near graduated OUT of this list in round 10: exact-Jaccard
    // verification makes its end state checkable against the q_dedup_ngram
    // shingle-overlap CTE (see dedupNear scaladoc)
    // q_dedup_simhash: xxhash64 signatures (fast path) — the shared
    // banding+verification machinery is oracle-anchored by the portable
    // q_dedup_simhash_verified. q_dedup_embed: xxhash64 LSH planes — exact
    // ends anchored by q_dedup_sweep/q_dedup_semantic, end-to-end planted
    // recall in LlmDataSpec. q_multimodal_frames_sigs: PNG-codec-byte- and
    // xxhash64-defined outputs no SQL engine can rebuild.
    val allowedNoOracle = Set("q_dedup_simhash", "q_dedup_embed",
      "q_multimodal_frames_sigs")
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.subsetOf(allowedNoOracle),
      s"queries missing an oracle without justification: ${noOracle -- allowedNoOracle}")
  }
}
