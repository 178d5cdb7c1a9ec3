package graft

/** Committed per-query reference timings for the outlier-triggered
  * scheduler probe (r11 verdict item 2): the same-tree local comparator
  * BENCH_LOCAL_r13.json (sf0.1, CPUS=32, healthy host regime — pre_p50
  * 0.021). Bench compares each timed query against this map and, on a
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
  val source = "BENCH_LOCAL_r13.json (sf0.1, cpus=32)"

  /** The committed artifact file (repo root) these values were
    * transcribed from — BenchFormatSpec parses it and asserts the map
    * below matches value-for-value, so a re-recorded comparator or a
    * transcription typo cannot silently skew which queries trigger
    * sched_hit probes. Update together with [[source]] and the map. */
  val sourceFile = "BENCH_LOCAL_r13.json"

  /** The regime the comparator was recorded in. The outlier trigger
    * only arms when the running config MATCHES — a cpus=4 debug run or
    * a different SF would legitimately exceed 1.5x on most heavy
    * queries and spray ~100 spurious probes (and tail lines) into the
    * artifact. */
  val sfDirSuffix = "sf0.1"
  val cpus = "32"

  val committed: Map[String, Double] = Map(
    "agg_distinct" -> 0.241,
    "agg_empty_input" -> 0.210,
    "agg_firstrow" -> 0.463,
    "agg_global" -> 0.598,
    "agg_group" -> 1.364,
    "ann_cosine_topk" -> 0.513,
    "ann_ivf" -> 3.502,
    "ann_lsh_bucketed" -> 0.837,
    "bpe_encode" -> 1.206,
    "bpe_train" -> 0.634,
    "catalog_tables" -> 0.847,
    "chunk_overlap" -> 0.460,
    "decontaminate" -> 1.516,
    "dedup_cdc" -> 1.385,
    "dedup_components" -> 6.486,
    "dedup_delta" -> 4.785,
    "dedup_embedding" -> 1.687,
    "dedup_exact" -> 0.330,
    "dedup_minhash_lsh" -> 5.206,
    "dedup_ngram_jaccard" -> 2.888,
    "dedup_passage" -> 1.381,
    "dedup_semantic" -> 2.844,
    "dedup_simhash" -> 2.300,
    "dedup_substring" -> 3.158,
    "dml_delete" -> 0.171,
    "dml_insert_select" -> 0.225,
    "dml_replace" -> 0.504,
    "emb_cosine_pairs" -> 0.520,
    "emb_quantize" -> 0.374,
    "events_attribution" -> 0.493,
    "events_funnel" -> 0.956,
    "events_json_extract" -> 0.784,
    "events_rollup" -> 0.631,
    "events_sessionize" -> 0.569,
    "events_window_agg" -> 0.638,
    "expr_arith" -> 0.225,
    "expr_coercion" -> 0.285,
    "expr_compare" -> 0.190,
    "expr_control" -> 0.125,
    "expr_logic" -> 0.189,
    "expr_predicates" -> 0.177,
    "expr_string" -> 0.186,
    "filter_selection" -> 0.191,
    "join_asof" -> 0.547,
    "join_cross" -> 0.305,
    "join_full_outer" -> 0.510,
    "join_inner" -> 0.521,
    "join_left_outer" -> 0.421,
    "join_merge" -> 0.709,
    "join_multiway" -> 0.996,
    "join_range_bucketed" -> 0.770,
    "join_right_outer" -> 0.251,
    "join_semi_anti" -> 0.483,
    "join_skew_salted" -> 1.054,
    "knn_label" -> 0.754,
    "limit_offset" -> 0.185,
    "lm_bigram_score" -> 2.215,
    "mix_budget" -> 0.372,
    "multimodal_features" -> 0.670,
    "multimodal_meta" -> 0.485,
    "ngram_novelty" -> 1.627,
    "orders_cube" -> 0.631,
    "pack_sequences" -> 0.746,
    "pipeline_corpus" -> 7.075,
    "pipeline_curation" -> 2.966,
    "pmi_collocations" -> 2.202,
    "projection_exprs" -> 0.145,
    "quality_buckets" -> 0.768,
    "quality_classifier" -> 0.673,
    "sample_hash" -> 0.184,
    "sample_stratified" -> 0.380,
    "sample_weighted" -> 0.210,
    "scan_bucketed_join" -> 0.466,
    "scan_dual" -> 0.057,
    "scan_pruned" -> 0.233,
    "set_ops" -> 0.713,
    "shuffle_shard" -> 0.371,
    "sort_multi" -> 0.403,
    "source_formats" -> 1.071,
    "source_overlap" -> 0.901,
    "sql_admin_check" -> 2.265,
    "sql_admin_show_ddl" -> 1.651,
    "sql_compact" -> 3.208,
    "sql_ddl_alter" -> 3.425,
    "sql_dml_lifecycle" -> 2.836,
    "sql_dual_vars" -> 0.579,
    "sql_roundtrip" -> 0.851,
    "sql_session_vars" -> 0.694,
    "sql_show_variables" -> 0.669,
    "sql_subquery" -> 0.824,
    "sql_txn" -> 1.857,
    "stats_cm_freq" -> 0.602,
    "stats_fm_ndv" -> 0.571,
    "stats_histogram" -> 1.464,
    "stats_topk" -> 0.339,
    "text_entropy" -> 1.304,
    "text_fingerprint" -> 0.148,
    "text_langid" -> 0.423,
    "text_pii_scrub" -> 0.535,
    "text_quality" -> 0.471,
    "text_rank" -> 1.826,
    "text_repetition" -> 0.834,
    "text_tfidf" -> 1.457,
    "text_token_count" -> 0.346,
    "topn" -> 0.229,
    "vocab_topk" -> 0.655,
    "window_funcs" -> 1.012)
}
