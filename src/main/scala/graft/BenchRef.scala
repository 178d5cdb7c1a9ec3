package graft

/** Committed per-query reference timings for the outlier-triggered
  * scheduler probe (r11 verdict item 2): since r19 the comparator is
  * the MEDIAN-OF-THREE merged artifact BENCH_LOCAL_r19.json
  * (gen_benchref.py --median; r17 verdict item 5), built from the
  * round's three CERTIFIED healthy windows — untouched-query medians
  * 0.995 / 0.970 / 1.006 vs the r17 comparator, totals
  * 119.192 / 113.627 / 118.232 s, all armed:true/fails:0 with healthy
  * probes (see BASELINE.md r19 recording notes). Median-of-3 closes
  * the r15/r17 single-window fast-edge/top-of-band recalibration
  * churn: a fast sub-2 s query's committed level is no longer
  * whichever edge of its band one window hit.
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
  * WATCH LIST (ADVICE r19, the ngram_novelty-note convention): the
  * r19 re-record baked two deliberate breaker-sweep slowdowns into the
  * trigger baseline — dedup_embedding 1.360 → 2.018 s and
  * dedup_minhash_lsh 4.864 → 5.091 s — so a future regression on
  * these two must exceed 1.5x of the HIGHER level to fire a
  * sched_hit. Each round, re-examine whether the eager-breaker cost
  * on dedup_embedding stays ~2.0 s (the breakers are count()
  * materializations whose cost should stay flat; a drift UP here is a
  * real regression the desensitized trigger may not catch).
  */
object BenchRef {
  /** Provenance of the committed values. */
  val source = "BENCH_LOCAL_r19.json (sf0.1, cpus=32)"

  /** The committed artifact file (repo root) these values were
    * transcribed from — BenchFormatSpec parses it and asserts the map
    * below matches value-for-value, so a re-recorded comparator or a
    * transcription typo cannot silently skew which queries trigger
    * sched_hit probes. Update together with [[source]] and the map. */
  val sourceFile = "BENCH_LOCAL_r19.json"

  /** The regime the comparator was recorded in. The outlier trigger
    * only arms when the running config MATCHES — a cpus=4 debug run or
    * a different SF would legitimately exceed 1.5x on most heavy
    * queries and spray ~100 spurious probes (and tail lines) into the
    * artifact. */
  val sfDirSuffix = "sf0.1"
  val cpus = "32"

  val committed: Map[String, Double] = Map(
    "agg_distinct" -> 0.249,
    "agg_empty_input" -> 0.236,
    "agg_firstrow" -> 0.639,
    "agg_global" -> 0.557,
    "agg_group" -> 0.859,
    "ann_cosine_topk" -> 0.548,
    "ann_ivf" -> 3.599,
    "ann_lsh_bucketed" -> 0.938,
    "bpe_encode" -> 1.476,
    "bpe_train" -> 0.663,
    "catalog_tables" -> 0.898,
    "chunk_overlap" -> 0.507,
    "decontaminate" -> 1.560,
    "dedup_cdc" -> 1.581,
    "dedup_components" -> 6.676,
    "dedup_delta" -> 4.623,
    "dedup_embedding" -> 2.018,
    "dedup_exact" -> 0.356,
    "dedup_minhash_lsh" -> 5.091,
    "dedup_ngram_jaccard" -> 3.000,
    "dedup_passage" -> 1.175,
    "dedup_semantic" -> 3.315,
    "dedup_simhash" -> 2.353,
    "dedup_substring" -> 3.322,
    "dml_delete" -> 0.174,
    "dml_insert_select" -> 0.269,
    "dml_replace" -> 0.406,
    "emb_cosine_pairs" -> 0.650,
    "emb_quantize" -> 0.347,
    "events_attribution" -> 0.501,
    "events_funnel" -> 0.969,
    "events_json_extract" -> 0.805,
    "events_rollup" -> 0.580,
    "events_sessionize" -> 0.661,
    "events_window_agg" -> 0.623,
    "expr_arith" -> 0.209,
    "expr_coercion" -> 0.352,
    "expr_compare" -> 0.147,
    "expr_control" -> 0.157,
    "expr_logic" -> 0.136,
    "expr_predicates" -> 0.167,
    "expr_string" -> 0.173,
    "filter_selection" -> 0.191,
    "join_asof" -> 0.515,
    "join_cross" -> 0.274,
    "join_full_outer" -> 0.497,
    "join_inner" -> 0.431,
    "join_left_outer" -> 0.406,
    "join_merge" -> 0.666,
    "join_multiway" -> 1.061,
    "join_range_bucketed" -> 0.999,
    "join_right_outer" -> 0.340,
    "join_semi_anti" -> 0.528,
    "join_skew_salted" -> 0.861,
    "knn_label" -> 0.898,
    "limit_offset" -> 0.153,
    "lm_bigram_score" -> 2.122,
    "mix_budget" -> 0.366,
    "multimodal_features" -> 0.838,
    "multimodal_meta" -> 0.582,
    "ngram_novelty" -> 1.674,
    "orders_cube" -> 0.545,
    "pack_sequences" -> 0.878,
    "pipeline_corpus" -> 7.660,
    "pipeline_curation" -> 2.609,
    "pmi_collocations" -> 2.139,
    "projection_exprs" -> 0.150,
    "quality_buckets" -> 0.709,
    "quality_classifier" -> 0.650,
    "sample_hash" -> 0.169,
    "sample_stratified" -> 0.338,
    "sample_weighted" -> 0.177,
    "scan_bucketed_join" -> 0.439,
    "scan_dual" -> 0.046,
    "scan_pruned" -> 0.217,
    "set_ops" -> 0.635,
    "shuffle_shard" -> 0.328,
    "sort_multi" -> 0.363,
    "source_formats" -> 0.949,
    "source_overlap" -> 0.930,
    "sql_admin_check" -> 1.963,
    "sql_admin_show_ddl" -> 1.723,
    "sql_compact" -> 2.910,
    "sql_ddl_alter" -> 2.569,
    "sql_dml_lifecycle" -> 2.538,
    "sql_dual_vars" -> 0.770,
    "sql_roundtrip" -> 1.005,
    "sql_session_vars" -> 0.743,
    "sql_show_variables" -> 0.778,
    "sql_subquery" -> 0.939,
    "sql_txn" -> 2.200,
    "stats_cm_freq" -> 0.549,
    "stats_fm_ndv" -> 0.568,
    "stats_histogram" -> 1.230,
    "stats_topk" -> 0.351,
    "text_entropy" -> 1.359,
    "text_fingerprint" -> 0.180,
    "text_langid" -> 0.472,
    "text_pii_scrub" -> 0.626,
    "text_quality" -> 0.525,
    "text_rank" -> 1.844,
    "text_repetition" -> 1.002,
    "text_tfidf" -> 1.221,
    "text_token_count" -> 0.343,
    "topn" -> 0.171,
    "vocab_topk" -> 0.597,
    "window_funcs" -> 0.828)
}
