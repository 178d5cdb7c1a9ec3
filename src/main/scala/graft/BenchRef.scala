package graft

/** Committed per-query reference timings for the outlier-triggered
  * scheduler probe (r11 verdict item 2): the same-tree local comparator
  * BENCH_LOCAL_r12.json (sf0.1, CPUS=32, healthy host regime — pre_p50
  * 0.023). Bench compares each timed query against this map and, on a
  * >1.5x reading, immediately runs the fixed-shape sched probe and
  * streams a `{"sched_hit":...}` line — so a sub-window host storm is
  * adjudicable from the artifact alone instead of needing manual
  * isolated re-runs (the r11 stats_topk/text_entropy blind spot).
  *
  * Regenerate from the latest committed BENCH_LOCAL_r*.json when the
  * comparator is re-recorded; values are seconds at 3 decimals.
  */
object BenchRef {
  /** Provenance of the committed values. */
  val source = "BENCH_LOCAL_r12.json (sf0.1, cpus=32)"

  /** The committed artifact file (repo root) these values were
    * transcribed from — BenchFormatSpec parses it and asserts the map
    * below matches value-for-value, so a re-recorded comparator or a
    * transcription typo cannot silently skew which queries trigger
    * sched_hit probes. Update together with [[source]] and the map. */
  val sourceFile = "BENCH_LOCAL_r12.json"

  /** The regime the comparator was recorded in. The outlier trigger
    * only arms when the running config MATCHES — a cpus=4 debug run or
    * a different SF would legitimately exceed 1.5x on most heavy
    * queries and spray ~100 spurious probes (and tail lines) into the
    * artifact. */
  val sfDirSuffix = "sf0.1"
  val cpus = "32"

  val committed: Map[String, Double] = Map(
    "agg_distinct" -> 0.248,
    "agg_empty_input" -> 0.188,
    "agg_firstrow" -> 0.460,
    "agg_global" -> 0.397,
    "agg_group" -> 1.176,
    "ann_cosine_topk" -> 0.439,
    "ann_ivf" -> 2.986,
    "ann_lsh_bucketed" -> 0.697,
    "bpe_encode" -> 1.144,
    "bpe_train" -> 0.613,
    "catalog_tables" -> 0.827,
    "chunk_overlap" -> 0.376,
    "decontaminate" -> 1.404,
    "dedup_cdc" -> 1.150,
    "dedup_components" -> 6.437,
    "dedup_delta" -> 5.107,
    "dedup_embedding" -> 1.387,
    "dedup_exact" -> 0.319,
    "dedup_minhash_lsh" -> 5.886,
    "dedup_ngram_jaccard" -> 3.271,
    "dedup_passage" -> 1.428,
    "dedup_semantic" -> 2.646,
    "dedup_simhash" -> 2.625,
    "dedup_substring" -> 4.157,
    "dml_delete" -> 0.156,
    "dml_insert_select" -> 0.213,
    "dml_replace" -> 0.479,
    "emb_cosine_pairs" -> 0.551,
    "emb_quantize" -> 0.392,
    "events_attribution" -> 0.585,
    "events_funnel" -> 0.975,
    "events_json_extract" -> 0.694,
    "events_rollup" -> 0.733,
    "events_sessionize" -> 0.717,
    "events_window_agg" -> 0.653,
    "expr_arith" -> 0.216,
    "expr_coercion" -> 0.237,
    "expr_compare" -> 0.128,
    "expr_control" -> 0.131,
    "expr_logic" -> 0.132,
    "expr_predicates" -> 0.167,
    "expr_string" -> 0.127,
    "filter_selection" -> 0.150,
    "join_asof" -> 0.690,
    "join_cross" -> 0.302,
    "join_full_outer" -> 0.534,
    "join_inner" -> 0.518,
    "join_left_outer" -> 0.393,
    "join_merge" -> 0.668,
    "join_multiway" -> 0.986,
    "join_range_bucketed" -> 0.785,
    "join_right_outer" -> 0.248,
    "join_semi_anti" -> 0.647,
    "join_skew_salted" -> 1.108,
    "knn_label" -> 0.729,
    "limit_offset" -> 0.167,
    "lm_bigram_score" -> 2.353,
    "mix_budget" -> 0.326,
    "multimodal_features" -> 0.834,
    "multimodal_meta" -> 0.462,
    "ngram_novelty" -> 1.265,
    "orders_cube" -> 0.579,
    "pack_sequences" -> 0.737,
    "pipeline_corpus" -> 8.443,
    "pipeline_curation" -> 2.850,
    "pmi_collocations" -> 2.620,
    "projection_exprs" -> 0.137,
    "quality_buckets" -> 0.576,
    "quality_classifier" -> 0.542,
    "sample_hash" -> 0.180,
    "sample_stratified" -> 0.346,
    "sample_weighted" -> 0.178,
    "scan_bucketed_join" -> 0.494,
    "scan_dual" -> 0.051,
    "scan_pruned" -> 0.223,
    "set_ops" -> 0.631,
    "shuffle_shard" -> 0.352,
    "sort_multi" -> 0.370,
    "source_formats" -> 0.933,
    "source_overlap" -> 0.933,
    "sql_admin_check" -> 2.181,
    "sql_admin_show_ddl" -> 1.880,
    "sql_compact" -> 3.037,
    "sql_ddl_alter" -> 3.547,
    "sql_dml_lifecycle" -> 2.897,
    "sql_dual_vars" -> 0.651,
    "sql_roundtrip" -> 0.950,
    "sql_session_vars" -> 0.704,
    "sql_show_variables" -> 0.640,
    "sql_subquery" -> 0.850,
    "sql_txn" -> 1.755,
    "stats_cm_freq" -> 0.573,
    "stats_fm_ndv" -> 0.492,
    "stats_histogram" -> 1.211,
    "stats_topk" -> 0.393,
    "text_entropy" -> 1.182,
    "text_fingerprint" -> 0.137,
    "text_langid" -> 0.411,
    "text_pii_scrub" -> 0.491,
    "text_quality" -> 0.454,
    "text_rank" -> 2.261,
    "text_repetition" -> 1.009,
    "text_tfidf" -> 1.213,
    "text_token_count" -> 0.292,
    "topn" -> 0.263,
    "vocab_topk" -> 0.600,
    "window_funcs" -> 0.958)
}
