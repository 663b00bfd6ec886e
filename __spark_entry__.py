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

#: Served first so a prefix-sampling driver exercises the newest
#: oracle-paired work each round (earlier rounds re-verified the
#: classic set twice); everything else follows in registration order.
_FRONT = [
    # round-4: corpus curation + event analytics + graph/skew diagnostics
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
    # reference-parity healthcare composition (round-2 flagship)
    "hc_patients_dim",
    "hc_admissions_first_seen",
    "hc_duplicate_patients_check",
    # round-3: ANN family + driver-checkable recall metrics
    "embedding_ann_ivf",
    "ann_recall_ivf_at5",
    "embedding_ann_signlsh",
    "ann_recall_signlsh_at5",
    # round-2/3 LLM-pipeline operators
    "doc_repetition_quality",
    "contamination_ngram_overlap",
    "embedding_cosine_near_dup",
    "training_set_selection",
    "source_quality_rollup",
    "sequence_packing_bins",
    "mixture_token_budget_selection",
    "doc_fingerprint_minshingle",
    "token_count_bpe_regex",
    "near_dup_clusters",
    # round-3: splits / corpus stats / attribution
    "doc_stratified_hash_split",
    "doc_vocab_growth_by_source",
    "event_attribution_last_touch",
    "lang_id_heuristic",
    "doc_chunk_windows",
    "window_rolling_median_order_value",
    "regex_funcs_part",
    "agg_filtered_order_stats",
    # round-2 TPC-H additions and events suite
    "q02_min_cost_supplier",
    "q11_important_stock",
    "tumbling_window_event_stats",
    "sliding_window_event_counts",
    "session_windows_per_user",
    "json_extract_event_props",
    "asof_latest_view_before_purchase",
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
