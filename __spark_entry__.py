"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export over ``projet5_spark.plans`` — the query catalog lives in
``projet5_spark/plans/{relational,events,llm}.py``, each entry a
DataFrame builder paired with its DuckDB oracle SQL
(``plans.registry``). See SURVEY.md §2 for the operator inventory these
cover.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet5_spark.plans import ORACLE, QUERIES  # noqa: E402
from projet5_spark.session import ensure_utc  # noqa: E402

SF0001 = "/root/testdata/sf0.001"

#: Served first so a prefix-sampling driver exercises work that has
#: never had a driver-green CORRECTNESS row. Rounds 1-6 certified 192 of
#: the 265 oracle-paired queries; the catalog is FROZEN at 273 entries
#: (265 oracle-paired + 8 rows-only by design) until the remaining 73
#: never-sampled entries are drained. This list is the round-7 slice:
#: 50 of the 73 (registration order), including the operators round 6's
#: perf work touched (winnowing, ngram-novelty, shingle containment,
#: spatial grid join, fd_audit_g3, encoding advisors, weighted median)
#: so the driver rows also lock in the optimized plans. The 23 names in
#: the round-8 comment below are the only entries then left unsampled.
#: All 73 pass the local DuckDB replica (tests/test_oracle.py) and the
#: stock-config vanilla sweep (tools/vanilla_gate.py); the driver row is
#: the hard signal this rotation converts. tests/test_catalog_gate.py
#: enforces the freeze: catalog growth without certification fails CI.
_FRONT = [
    "basket_association_rules",
    "rfm_segmentation",
    "ab_test_zscore_verdict",
    "churn_inactivity_profile",
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
    "gini_revenue_concentration",
    "spatial_grid_join_profile",
    "fd_audit_g3",
    "lang_confusion_matrix",
    "embedding_covariance_topvar",
    "orders_open_backlog_by_month",
    "partition_merkle_digests",
    "zonemap_pruning_audit",
    "golden_record_survivorship",
    "woe_iv_price_bins",
    "vocab_oov_rate_by_source",
    "graph_strength_assortativity",
    "join_size_estimate_audit",
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
    "abc_classification_parts",
    "salted_join_revenue_by_nation",
    "trending_parts_wow_lift",
    "multi_touch_attribution_decay",
    # ------------------------------------------------------------------
    # Round-8 rotation (final 23 — after this every oracle-paired
    # catalog entry has a driver-green row in some round):
    #   label_centroid_cosine_matrix
    #   window_cume_dist_nth_value
    #   json_malformed_rate_audit
    #   conversion_time_histogram
    #   hof_zip_exists_forall_embeddings
    #   schema_evolution_union_orders
    #   asof_nearest_view_per_purchase
    #   business_days_to_ship_by_priority
    #   qq_decile_points_order_status
    #   feature_scaler_params_embeddings
    #   class_weights_inverse_freq
    #   split_leakage_exact_dups
    #   target_encoding_segment_smoothed
    #   relational_division_all_top_suppliers
    #   not_in_vs_not_exists_null_trap
    #   percentile_disc_vs_cont_by_priority
    #   delta_encoding_advisor_lineitem
    #   poisson_bootstrap_ci_event_mean
    #   kcore3_trade_graph_unrolled
    #   eventually_follows_support
    #   kl_divergence_doc_lengths
    #   events_daily_densified_zero_fill
    #   rank_with_ties_top_quantity_orders
]


def _rotated(names) -> list[str]:
    front = [n for n in _FRONT if n in names]
    return front + [n for n in names if n not in set(front)]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (SURVEY.md §7.1): the composed reference-parity healthcare
    pipeline — scan → rename → full-row dedup → normalize → surrogate
    keys → first-seen admission dedup — on sf0.001."""
    ensure_utc(spark)
    return QUERIES["hc_admissions_first_seen"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_utc(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(QUERIES[name]) for name in _rotated(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here are
    non-SQL-expressible ops (driver does a rows-only check)."""
    return {name: ORACLE[name] for name in _rotated(ORACLE)}
