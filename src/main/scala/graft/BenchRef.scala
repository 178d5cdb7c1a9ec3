package graft

/** Committed per-query reference timings for the outlier-triggered
  * scheduler probe (r11 verdict item 2): since r19 the comparator is a
  * MEDIAN-OF-THREE merged artifact (gen_benchref.py --median; r17
  * verdict item 5). The r21 re-record (r20 verdict item 6 — the round's
  * optimizations moved the dedup tail 0.68–0.83×, so the r19 floors
  * had gone stale exactly where regression protection matters) merges
  * BENCH_LOCAL_r21_w{1,2,3}.json — totals 116.5 / 100.2 / 122.8 s,
  * all armed:true/fails:0 with healthy probes (0.015–0.023 p50s).
  * Caveat, recorded for the next re-reader: only w2 (100.2 s,
  * untouched-median 0.883 vs the r19 comparator — the all-time best
  * window) met the ≈1.00 certification band; w1/w3 read 1.021/1.045
  * and the session's four other windows were worse — the degraded-host
  * regime of r16/r18. The per-query MEDIAN therefore sits at the
  * w1/w3 level for most unchanged queries, i.e. ~2–4% ABOVE the true
  * healthy floor — a deliberately conservative trigger baseline (a
  * hair fewer spurious hits in drift windows; see BASELINE.md r21
  * recording notes). Median-of-3 still closes the r15/r17
  * single-window fast-edge churn.
  *
  * Bench compares each timed query against this map and, on a >1.5x
  * reading, immediately runs the fixed-shape sched probe and streams a
  * `{"sched_hit":...}` line — so a sub-window host storm is
  * adjudicable from the artifact alone instead of needing manual
  * isolated re-runs (the r11 stats_topk/text_entropy blind spot).
  *
  * Regenerate from the latest committed BENCH_LOCAL_r*.json when the
  * comparator is re-recorded; values are seconds at 3 decimals.
  *
  * WATCH LIST: the r19 dedup_embedding eager-breaker watch stayed
  * closed through r20/r21 (1.57–1.75 s vs the old 2.018 baked level;
  * the r21 floor re-records it at its real 1.710 s median). No
  * deliberately-desensitized entries remain in this map.
  */
object BenchRef {
  /** Provenance of the committed values. */
  val source = "BENCH_LOCAL_r21.json (sf0.1, cpus=32)"

  /** The committed artifact file (repo root) these values were
    * transcribed from — BenchFormatSpec parses it and asserts the map
    * below matches value-for-value, so a re-recorded comparator or a
    * transcription typo cannot silently skew which queries trigger
    * sched_hit probes. Update together with [[source]] and the map. */
  val sourceFile = "BENCH_LOCAL_r21.json"

  /** The regime the comparator was recorded in. The outlier trigger
    * only arms when the running config MATCHES — a cpus=4 debug run or
    * a different SF would legitimately exceed 1.5x on most heavy
    * queries and spray ~100 spurious probes (and tail lines) into the
    * artifact. */
  val sfDirSuffix = "sf0.1"
  val cpus = "32"

  val committed: Map[String, Double] = Map(
    "agg_distinct" -> 0.246,
    "agg_empty_input" -> 0.180,
    "agg_firstrow" -> 0.539,
    "agg_global" -> 0.591,
    "agg_group" -> 0.676,
    "ann_cosine_topk" -> 0.533,
    "ann_ivf" -> 4.004,
    "ann_lsh_bucketed" -> 0.740,
    "bpe_encode" -> 1.163,
    "bpe_train" -> 0.668,
    "catalog_tables" -> 0.840,
    "chunk_overlap" -> 0.460,
    "decontaminate" -> 0.681,
    "dedup_cdc" -> 1.251,
    "dedup_components" -> 6.731,
    "dedup_delta" -> 3.164,
    "dedup_embedding" -> 1.710,
    "dedup_exact" -> 0.404,
    "dedup_minhash_lsh" -> 4.239,
    "dedup_ngram_jaccard" -> 2.305,
    "dedup_passage" -> 0.936,
    "dedup_semantic" -> 3.741,
    "dedup_simhash" -> 2.312,
    "dedup_substring" -> 2.718,
    "dml_delete" -> 0.229,
    "dml_insert_select" -> 0.242,
    "dml_replace" -> 0.438,
    "emb_cosine_pairs" -> 0.684,
    "emb_quantize" -> 0.460,
    "events_attribution" -> 0.433,
    "events_funnel" -> 0.834,
    "events_json_extract" -> 0.863,
    "events_rollup" -> 0.578,
    "events_sessionize" -> 0.675,
    "events_window_agg" -> 0.522,
    "expr_arith" -> 0.212,
    "expr_coercion" -> 0.391,
    "expr_compare" -> 0.159,
    "expr_control" -> 0.167,
    "expr_logic" -> 0.145,
    "expr_predicates" -> 0.175,
    "expr_string" -> 0.153,
    "filter_selection" -> 0.161,
    "join_asof" -> 0.506,
    "join_cross" -> 0.249,
    "join_full_outer" -> 0.400,
    "join_inner" -> 0.453,
    "join_left_outer" -> 0.393,
    "join_merge" -> 0.769,
    "join_multiway" -> 1.030,
    "join_range_bucketed" -> 0.965,
    "join_right_outer" -> 0.362,
    "join_semi_anti" -> 0.586,
    "join_skew_salted" -> 0.859,
    "knn_label" -> 0.915,
    "limit_offset" -> 0.211,
    "lm_bigram_score" -> 1.826,
    "mix_budget" -> 0.357,
    "multimodal_features" -> 1.046,
    "multimodal_meta" -> 0.605,
    "ngram_novelty" -> 1.155,
    "orders_cube" -> 0.594,
    "pack_sequences" -> 0.813,
    "pipeline_corpus" -> 7.299,
    "pipeline_curation" -> 2.402,
    "pmi_collocations" -> 1.609,
    "projection_exprs" -> 0.201,
    "quality_buckets" -> 0.701,
    "quality_classifier" -> 0.543,
    "sample_hash" -> 0.169,
    "sample_stratified" -> 0.334,
    "sample_weighted" -> 0.192,
    "scan_bucketed_join" -> 0.460,
    "scan_dual" -> 0.064,
    "scan_pruned" -> 0.206,
    "set_ops" -> 0.547,
    "shuffle_shard" -> 0.328,
    "sort_multi" -> 0.328,
    "source_formats" -> 0.952,
    "source_overlap" -> 0.954,
    "sql_admin_check" -> 1.895,
    "sql_admin_show_ddl" -> 2.065,
    "sql_compact" -> 3.064,
    "sql_ddl_alter" -> 3.499,
    "sql_dml_lifecycle" -> 2.588,
    "sql_dual_vars" -> 0.708,
    "sql_roundtrip" -> 1.606,
    "sql_session_vars" -> 0.747,
    "sql_show_variables" -> 0.758,
    "sql_subquery" -> 1.010,
    "sql_txn" -> 1.853,
    "stats_cm_freq" -> 0.562,
    "stats_fm_ndv" -> 0.580,
    "stats_histogram" -> 1.098,
    "stats_topk" -> 0.477,
    "text_entropy" -> 1.278,
    "text_fingerprint" -> 0.189,
    "text_langid" -> 0.478,
    "text_pii_scrub" -> 0.592,
    "text_quality" -> 0.698,
    "text_rank" -> 1.562,
    "text_repetition" -> 1.359,
    "text_tfidf" -> 1.159,
    "text_token_count" -> 0.277,
    "topn" -> 0.171,
    "vocab_topk" -> 0.576,
    "window_funcs" -> 0.810)
}
