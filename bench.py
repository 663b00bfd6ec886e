"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology (BASELINE.md §3): warm session, per-query wall-clock is the
median of 3 runs after 1 warm-up; `value` is the sum of per-query
medians. The heavy quadratic ground-truth query (ngram_jaccard_near_dup)
and the ML-fit LSH queries are excluded from the headline set — they are
correctness/recall baselines, not throughput paths.

TIER 2 (round 10): everything in the catalog that is not a headline
query runs after the headline pass and is reported under
``tier2_queries`` — full-catalog coverage with zero silently unbenched
entries (the set is COMPUTED as catalog − headline, so new queries are
benched by default). Tier-2 membership, not exclusion, is where the
former named exclusions live: iterative loops (near_dup_clusters,
kcore3), multi-action replays (streaming availableNow,
snapshot_scd2_history, the maintained-index ingest), and the
ground-truth pair family time their whole multi-job lifecycle there,
which is honest for coverage but would pollute the headline throughput
metric — `value` therefore still sums ONLY the headline medians,
keeping it comparable with every earlier round's artifact.

Tier-2 protocol (round 11): one cold shot for cheap entries, but any
entry whose cold shot exceeds ``TIER2_MEDIAN_FLOOR_SEC`` is re-run
twice more and reported as a cold-inclusive median-of-3 — a single
reading of a 10-second streaming replay carries this box's full
ambient swing (±25%+), whereas sub-second entries' absolute noise is
too small to justify tripling the tier's cost. ``tier2_runs`` in the
artifact records the per-entry run count.
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet5_spark.plans import QUERIES  # noqa: E402
from projet5_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_region_revenue",
    "q06_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customers",
    "join_left_order_counts",
    "join_anti_customers_without_orders",
    "join_range_shipped_late",
    "agg_nation_customer_stats",
    "rollup_region_nation_balance",
    "cube_status_priority",
    "window_top3_customers_per_nation",
    "window_running_revenue",
    "window_moving_avg_30d",
    "sort_topk_orders",
    "dedup_first_lineitem_per_order",
    "string_funcs_customer",
    "date_funcs_orders",
    "json_extract_event_props",
    "tumbling_window_event_stats",
    "session_windows_per_user",
    "asof_latest_view_before_purchase",
    "doc_exact_dedup",
    "doc_token_stats",
    "doc_quality_score",
    "doc_fingerprint_minshingle",
    "embedding_topk_cosine",
    "simhash_near_dup",
    "q07_volume_shipping",
    "q12_shipmode_priority",
    "q13_customer_distribution",
    "q14_promo_revenue_share",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "stats_percentiles_acctbal",
    "stats_variance_acctbal",
    "argmax_order_per_customer",
    "series_monthly_orders_gapfill",
    "tfidf_top_terms",
    "udf_pandas_quality_score",
    "sql_cte_nation_revenue_rank",
    "sql_correlated_max_order",
    "q08_market_share",
    "q15_top_supplier",
    "q21_waiting_orders",
    "q02_min_cost_supplier",
    "q11_important_stock",
    "doc_repetition_quality",
    "contamination_ngram_overlap",
    "embedding_cosine_near_dup",
    "token_count_bpe_regex",
    "training_set_selection",
    "hc_patients_dim",
    "hc_admissions_first_seen",
    "embedding_ann_signlsh",
    "ann_recall_ivf_at5",
    "doc_stratified_hash_split",
    "doc_vocab_growth_by_source",
    "event_attribution_last_touch",
    "doc_chunk_windows",
    "window_rolling_median_order_value",
    "regex_funcs_part",
    "agg_filtered_order_stats",
    "pii_redact_customer_text",
    "boilerplate_line_dedup",
    "bigram_lm_doc_score",
    "rolling_7d_active_users",
    "event_transition_matrix",
    "anomaly_zscore_event_values",
    "key_skew_profile_orders",
    "pagerank_nation_trade_3iter",
    "dq_constraint_checks",
    "snapshot_diff_orders",
    "shuffle_balance_profile",
    "ewma_event_values",
    "inverted_index_terms",
    "approx_distinct_parts",
    "triangle_count_trade_graph",
    "quantile_sketch_verdict_prices",
    "er_blocking_match_stats",
    "bpe_first_merge_pairs",
    "events_resample_interpolate",
    "stratified_sample_orders",
    "weighted_sample_orders_aes",
    "incremental_agg_merge_orders",
    "url_domain_stats",
    "cross_source_duplicate_matrix",
    "zorder_key_orders",
    "compaction_bin_packing",
    "range_partition_boundaries",
    "event_time_disorder_profile",
    "daily_value_percentiles",
    "hc_k_anonymity_audit",
    "scd2_point_in_time_join",
    "packing_efficiency_stats",
    "gdpr_erasure_audit",
    "freq_items_verdict_returnflag",
    "substring_dup_coverage",
    "pmi_top_collocations",
    "char_entropy_quality",
    "interval_overlap_orders_months",
    "user_value_trend_slope",
    "benford_first_digit_audit",
    "decile_lift_customers",
    "mad_outliers_order_price",
    "variant_event_props_stats",
    "udtf_token_runs",
    "pipe_syntax_monthly_revenue",
    "listagg_nation_segments",
    "reservoir_sample_per_segment",
    "doc_concat_eos_offsets",
    "bloom_membership_verdict",
    "pysource_digest_rows",
    "groupby_all_status_priority",
    "basket_association_rules",
    "rfm_segmentation",
    "ab_test_zscore_verdict",
    "churn_inactivity_profile",
    "hll_partition_union_verdict",
    "skyline_pareto_parts",
    "table_content_checksum",
    "embedding_int8_quant_error",
    "event_path_trigrams",
    "cusum_changepoint_events",
    "seasonal_hourly_profile",
    "acf_lag1_hourly_by_type",
    "tokenizer_fertility_by_lang",
    "doc_length_trim_stats",
    "winnowing_fingerprints",
    "ngram_novelty_decay",
    "cdc_batch_conflicts",
    "groupingsets_dfapi_region_nation",
    "ks_test_event_values",
    "psi_population_stability",
    "chi_square_status_priority",
    "gini_revenue_concentration",
    "bm25_topk_docs",
    "tfidf_cosine_pairs_topk",
    "spatial_grid_join_profile",
    "fd_audit_g3",
    "hc_l_diversity_audit",
    "lang_confusion_matrix",
    "embedding_covariance_topvar",
    "orders_open_backlog_by_month",
    "partition_merkle_digests",
    "zonemap_pruning_audit",
    "golden_record_survivorship",
    "woe_iv_price_bins",
    "minhash_jaccard_estimate_gate",
    "vocab_oov_rate_by_source",
    "graph_strength_assortativity",
    "join_size_estimate_audit",
    "symspell_fuzzy_name_match",
    "twap_event_values_daily",
    "cycle_time_percentiles_by_priority",
    "ohlc_daily_event_bars",
    "orderkey_gap_ranges",
    "weighted_median_price_by_flag",
    "rle_run_profile_lineitem",
    "dict_encoding_advisor_lineitem",
    "mann_kendall_trend_events",
    "shingle_containment_pairs",
    "doc_prefix_dup_groups",
    "zipf_slope_vocab",
    "fs_linkage_verdicts",
    "fk_orphan_rate_audit",
    "stl_naive_decomposition_daily",
    "bollinger_breakout_days",
    "session_bounce_rate_daily",
    "recursive_cte_bfs_hops",
    "abc_classification_parts",
    "salted_join_revenue_by_nation",
    "trending_parts_wow_lift",
    "multi_touch_attribution_decay",
    "label_centroid_cosine_matrix",
    "decimal_exact_sum_verdict",
    "window_cume_dist_nth_value",
    "json_malformed_rate_audit",
    "ppjoin_prefix_filter_pairs",
    "conversion_time_histogram",
    "hof_zip_exists_forall_embeddings",
    "schema_evolution_union_orders",
    "asof_nearest_view_per_purchase",
    "business_days_to_ship_by_priority",
    "qq_decile_points_order_status",
    "feature_scaler_params_embeddings",
    "class_weights_inverse_freq",
    "split_leakage_exact_dups",
    "target_encoding_segment_smoothed",
    "relational_division_all_top_suppliers",
    "not_in_vs_not_exists_null_trap",
    "percentile_disc_vs_cont_by_priority",
    "delta_encoding_advisor_lineitem",
    "poisson_bootstrap_ci_event_mean",
    "eventually_follows_support",
    "kl_divergence_doc_lengths",
    "events_daily_densified_zero_fill",
    "rank_with_ties_top_quantity_orders",
    # near_dup_clusters excluded: iterative (multi-action convergence
    # loop) — correctness-gated against the recursive-CTE oracle, but
    # not a single-plan throughput path; embedding_ann_ivf_kmeans
    # excluded with the other ML-fit queries (recall baseline, not a
    # throughput path); snapshot_scd2_history excluded for the same
    # multi-action reason (two eager merge writes + a read per call);
    # kcore3_trade_graph_unrolled excluded: deliberately iteration-deep
    # plan (3 unrolled peels => ~10 serial tiny-stage jobs) — it is
    # correctness-gated against the unrolled-CTE oracle, but measures
    # scheduler latency, not data throughput
    # --- round 8 additions ---
    "csv_scan_roundtrip_nation",
    "json_scan_roundtrip_events",
    "json_multiline_scan_region",
    "to_json_from_json_roundtrip_orders",
    "partitioned_write_pruned_scan_orders",
    "csv_scan_corrupt_quarantine",
    "try_arithmetic_null_on_error",
    "gopher_quality_rules_docs",
    "set_except_all_multiplicity",
    "multimodal_resize_thumbnails",
    # --- round 9 additions ---
    "curation_pipeline_end_to_end",
    "epoch_shuffle_shards",
    "quality_threshold_calibration",
    # --- round 9 batch-29 additions (split/mixture/hard-negative) ---
    "temporal_split_embargo",
    "stratified_kfold_assignment",
    "source_temperature_mixture",
    "hard_negative_mining_centroids",
    # --- round 9 batch-30 additions (observability / SQL surface) ---
    "psi_monthly_drift_monitor",
    "decontamination_span_offsets",
    "jl_projection_distortion",
    "sql_udf_margin_bands",
    "parameterized_sql_orders",
    # --- round 9 batch-31 addition ---
    "source_quality_cap_topk",
    # --- round 9 batch-32 additions (certified iterative ML, survival) ---
    "kmeans_lloyd_certified",
    "kaplan_meier_customer_survival",
    "covariance_power_iteration_topdir",
    # --- round 9 batch-33 additions (source formats, Spark-4 SQL) ---
    "orc_scan_roundtrip_nation",
    "text_scan_corpus_lines",
    "xml_scan_roundtrip_region",
    "collation_lcase_grouping",
    # --- headline-only exclusions (all still benched in TIER 2) ---
    # streaming *_availablenow entries: availableNow micro-batch
    # replays (start a streaming query, drain, read the memory sink) —
    # multi-action like snapshot_scd2_history; their wall measures
    # micro-batch scheduling latency, not data throughput.
    # incremental_near_dup_ingest / near_dup_cluster_quality_keep /
    # near_dup_threshold_curve / ngram_jaccard_near_dup /
    # shingle_index_incremental_ingest: the exact-Jaccard ground-truth
    # family — a correctness baseline, not a throughput path.
    # Since round 10 nothing is UNbenched: every catalog entry outside
    # this list runs once in tier 2 (computed as catalog − headline).
]

#: Ambient-load sentinel: q01 timed in isolation at the start and end
#: of the run. BASELINE.md §5.1 documents ±20-30% box-noise drift
#: between rounds; the sentinel pins each refresh's ambient level so
#: cross-round comparisons can normalize instead of hand-waving.
SENTINEL = "q01_pricing_summary"

#: CPU-bound sentinel: BASELINE.md §6 showed the q01 sentinel is
#: dominated by the stage-scheduling floor and under-captures drift on
#: CPU-heavy queries (two identical-code runs differed 10% at matched
#: q01 sentinels). bigram_lm_doc_score is expression-heavy (token
#: explode + bigram window + log-prob aggregation, no similarity-join
#: fan-out), so its isolated reading tracks the box's *compute*
#: headroom; read both pairs before attributing per-query deltas.
SENTINEL_CPU = "bigram_lm_doc_score"

#: Reference ambient level for cross-round normalization: the
#: round-8-close committed BENCH.json sentinel medians. Each round's
#: artifact also records ``queries_normalized`` =
#: ``t * (REF_CPU_SENTINEL / run_cpu_sentinel_mean)`` next to the raw
#: medians, so round-over-round deltas can be read directly instead of
#: re-deriving the ambient correction in every verdict. The q01
#: reference rides along for the scheduling-floor reading. Raw medians
#: stay the contract value — normalization is a LENS (it assumes
#: CPU-bound queries scale with the sentinel, which BASELINE.md §7
#: shows is approximately, not exactly, true).
REF_CPU_SENTINEL = 1.5613  # mean(1.7143, 1.4082), round-8 close
REF_Q01_SENTINEL = 0.5606  # mean(0.6194, 0.5018), round-8 close

#: Tier-2 entries whose single cold shot exceeds this are re-run to a
#: median-of-3 (round-10 verdict: a 13.5 s streaming replay timed once
#: is an ambient lottery ticket; a 0.3 s entry is not worth tripling).
TIER2_MEDIAN_FLOOR_SEC = 3.0


def time_query(
    spark, name: str, sf_dir: str, runs: int = 3, warmup: bool = True
) -> float:
    fn = QUERIES[name]
    if warmup:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        # noop sink executes the full plan without collect/driver transfer
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    # release the query's localCheckpoint blocks: dropping the Python
    # refs + a gc pass lets the ContextCleaner free executor storage,
    # and the explicit unpersist sweep makes the release deterministic
    # (operators/materialize.py) — so late-listed queries aren't
    # penalized by ~100 queries' worth of accumulated checkpoint blocks
    gc.collect()
    from projet5_spark.operators.materialize import (
        release_persistent_rdds,
        sweep_checkpoint_scratch,
    )

    release_persistent_rdds(spark)
    # drop parquet-checkpoint scratch too: checkpoint-returning queries
    # (minhash_lsh_near_dup) leave one scratch copy per run otherwise
    sweep_checkpoint_scratch(spark)
    return statistics.median(samples)


def emit_result_line(payload: dict) -> None:
    """Print the one-line JSON contract as the FINAL stdout line.

    The round-11 driver artifact captured only a truncated stdout tail
    and lost the JSON (`BENCH_r11.json: parsed: null`), killing the
    round-over-round comparison. Hardening (r13, VERDICT item 8):
    flush both streams first so anything buffered lands BEFORE the
    JSON, emit with an explicit flush, and the caller stops Spark
    before calling so no later shutdown chatter can follow it on
    stdout. tests/test_instrumentation.py asserts the last-stdout-line
    property end-to-end in a subprocess."""
    sys.stderr.flush()
    sys.stdout.flush()
    print(json.dumps(payload), flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0  # unknown scale factor — still bench, just flag it
    spark = get_spark(app_name="projet5-bench")
    spark.sparkContext.setLogLevel("ERROR")

    from projet5_spark.instrumentation import run_logged, run_stats_summary

    queries: dict[str, float] = {}
    # run_logged = the R20 instrumentation surface: stderr gets the
    # reference-format wall-clock/stage/shuffle banner, stdout stays
    # the single JSON contract line
    with run_logged(spark, "bench"):
        sentinel_start = round(time_query(spark, SENTINEL, sf_dir), 4)
        sentinel_cpu_start = round(time_query(spark, SENTINEL_CPU, sf_dir), 4)
        for name in HEADLINE:
            queries[name] = round(time_query(spark, name, sf_dir), 4)
        sentinel_end = round(time_query(spark, SENTINEL, sf_dir), 4)
        sentinel_cpu_end = round(time_query(spark, SENTINEL_CPU, sf_dir), 4)
        # tier 2: full-catalog coverage (module docstring on why these
        # are not headline material); heavy entries get a median-of-3
        tier2: dict[str, float] = {}
        tier2_runs: dict[str, int] = {}
        for name in sorted(set(QUERIES) - set(HEADLINE)):
            cold = time_query(spark, name, sf_dir, runs=1, warmup=False)
            if cold > TIER2_MEDIAN_FLOOR_SEC:
                reruns = [
                    time_query(spark, name, sf_dir, runs=1, warmup=False)
                    for _ in range(2)
                ]
                tier2[name] = round(statistics.median([cold] + reruns), 4)
                tier2_runs[name] = 3
            else:
                tier2[name] = round(cold, 4)
                tier2_runs[name] = 1

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "RUNSTATS.json"), "w") as f:
        json.dump(run_stats_summary(spark), f, indent=1, sort_keys=True)

    total = round(sum(queries.values()), 4)
    run_cpu = (sentinel_cpu_start + sentinel_cpu_end) / 2 or REF_CPU_SENTINEL
    norm = REF_CPU_SENTINEL / run_cpu
    queries_normalized = {n: round(t * norm, 4) for n, t in queries.items()}
    # stop Spark BEFORE emitting: py4j/JVM shutdown can write to the
    # console, and the contract line must be the last thing on stdout
    spark.stop()
    emit_result_line(
            {
                # v2 (round 11+): tier2_runs became a per-query dict
                # (1 = single cold shot, 3 = cold-inclusive median-of-3)
                # and tier2_value sums mixed single-shot and median
                # readings. v1 (rounds <=10) had scalar tier2 runs.
                # Cross-round tooling should branch on this marker.
                "bench_schema_version": 2,
                "metric": "sum_of_median_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "queries_normalized": queries_normalized,
                "value_normalized": round(sum(queries_normalized.values()), 4),
                "normalization": {
                    "ref_cpu_sentinel": REF_CPU_SENTINEL,
                    "ref_q01_sentinel": REF_Q01_SENTINEL,
                    "run_cpu_sentinel_mean": round(run_cpu, 4),
                    "factor": round(norm, 4),
                },
                "tier2_queries": tier2,
                "tier2_value": round(sum(tier2.values()), 4),
                "tier2_runs": tier2_runs,
                "sf": sf,
                "sentinel_q01_start_sec": sentinel_start,
                "sentinel_q01_end_sec": sentinel_end,
                "sentinel_cpu_start_sec": sentinel_cpu_start,
                "sentinel_cpu_end_sec": sentinel_cpu_end,
            }
    )


if __name__ == "__main__":
    main()
