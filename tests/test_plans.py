"""Physical-plan audits (the 100 TB posture checks): predicates reach
the parquet scan, projections prune columns, dims broadcast, top-k
compiles to TakeOrdered / WindowGroupLimit — asserted on the explain
output so a regression in plan shape fails CI, not a 100 TB run."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from projet5_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q06_full_predicate_pushdown(spark):
    plan = plan_of(spark, "q06_forecast_revenue")
    assert "PushedFilters:" in plan
    # every predicate column reaches the scan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q01_column_pruning(spark):
    plan = plan_of(spark, "q01_pricing_summary")
    schema_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert schema_lines, plan
    # untouched columns must not be read
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in schema_lines[0], f"{col} read but unused"


def _simple_plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def _node_indent(line: str) -> int:
    return len(line) - len(line.lstrip(" :+-*"))


def _broadcast_subtrees(plan: str) -> list[str]:
    """Subtree text under each BroadcastExchange node (tree indentation)."""
    lines = plan.splitlines()
    out = []
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        d = _node_indent(ln)
        sub = []
        for nxt in lines[i + 1:]:
            if nxt.strip() and _node_indent(nxt) <= d:
                break
            sub.append(nxt)
        out.append("\n".join(sub))
    return out


# TPC-H column prefixes of SF-proportional tables: these must never sit
# on a broadcast build side unhinted — except *below an aggregate*,
# i.e. a provably-selective derived set (q18's HAVING>300 key set).
_FACT_COL = re.compile(r"FileScan parquet \[(?:l_|o_|c_|s_|p_)")


@pytest.mark.parametrize(
    "name",
    [
        "q02_min_cost_supplier",
        "q03_shipping_priority",
        "q05_region_revenue",
        "q07_volume_shipping",
        "q09_profit_by_nation_year",
        "q10_returned_items",
        "q11_important_stock",
        "q18_large_volume_customers",
        "q21_waiting_orders",
    ],
)
def test_broadcast_policy_no_fact_build_side(spark, name):
    """Per-table broadcast policy (the 100 TB posture): with runtime
    auto-broadcast disabled, every BroadcastExchange left in the static
    plan is hint-forced — and a hint is only allowed on bounded dims
    (region/nation) or an aggregated (selective) derived set. AQE may
    still upgrade the others at runtime when a side is actually small;
    that path is size-gated and safe at any SF."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _simple_plan(spark, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for sub in _broadcast_subtrees(plan):
        if not _FACT_COL.search(sub):
            continue  # bounded-dim broadcast (nation/region) — fine
        assert "Aggregate" in sub, (
            f"{name}: SF-proportional table hint-broadcast without an "
            f"intervening aggregate:\n{sub}"
        )


def test_bounded_dims_still_broadcast(spark):
    """The dim hints must survive: nation/region joins stay broadcast
    even with runtime auto-broadcast off."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ("q05_region_revenue", "q10_returned_items"):
            plan = _simple_plan(spark, name)
            assert "BroadcastExchange" in plan, f"{name}: dim hint lost"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_anti_join_is_hash_not_nlj(spark):
    plan = plan_of(spark, "join_anti_customers_without_orders")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_keeps_equi_hash(spark):
    """The theta conjunct must stay a residual on a hash join, not
    degrade the whole join to a nested loop."""
    plan = plan_of(spark, "join_range_shipped_late")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_topk_is_take_ordered(spark):
    plan = plan_of(spark, "sort_topk_orders")
    assert "TakeOrderedAndProject" in plan, "LIMIT+ORDER compiled to full sort"


def test_grouped_topk_uses_window_group_limit(spark):
    plan = plan_of(spark, "window_top3_customers_per_nation")
    assert "WindowGroupLimit" in plan, "rank filter not pushed below shuffle"


def test_q01_whole_stage_codegen(spark):
    df = QUERIES["q01_pricing_summary"](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    assert "WholeStageCodegen" in out and "Found" in out


def test_scalar_subquery_not_recomputed_per_row(spark):
    plan = plan_of(spark, "scalar_subquery_above_avg")
    assert "Subquery" in plan or "ReusedSubquery" in plan
    assert "CartesianProduct" not in plan


def test_partition_pruning_on_partitioned_write(spark, tmp_path):
    """partitionBy layout must yield PartitionFilters (directory-level
    pruning), not a data filter over a full scan."""
    from projet5_spark.sources.writers import write_parquet

    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "status", F.col("o_orderstatus")
    )
    path = str(tmp_path / "orders_part")
    write_parquet(orders, path, partition_by=["status"])
    back = spark.read.parquet(path).where(F.col("status") == "F")
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf_line = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "status" in pf_line


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key co-locate: the sort-merge
    join runs without an Exchange on either side."""
    fact = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey", "o_custkey")
    dim = spark.read.parquet(f"{SF}/customer.parquet").select("c_custkey", "c_name")
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    fact.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("b_orders")
    dim.write.bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("b_customer")
    # force the sort-merge path (broadcast would win at fixture size and
    # bucketing is about avoiding the SMJ shuffle)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join still shuffles:\n" + plan
        )
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_contamination_eval_filter_pushdown(spark):
    """The eval-set predicate (doc_id < 10) must reach the parquet scan
    so the eval side never materializes the corpus."""
    plan = plan_of(spark, "contamination_ngram_overlap")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("LessThan(doc_id,10)" in ln for ln in pushed), pushed


def test_embedding_cosine_near_dup_is_blocked_groups(spark):
    """The all-pairs cosine must be the distributed block-pair scheme:
    the block map is the only broadcast, the corpus shuffles ONCE on
    the (i, j) pair key, and the quadratic kernel runs vectorized in
    FlatMapGroupsInPandas — no driver collect, no corpus broadcast
    variable, no per-pair JVM expression evaluation."""
    plan = plan_of(spark, "embedding_cosine_near_dup")
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # one broadcast join: the B^2-row block map (formatted explain
    # lists each node twice: tree line + detail block)
    assert plan.count("BroadcastHashJoin") == 2, plan
    # ... and exactly one hash shuffle, keyed by the pair id
    assert plan.count("hashpartitioning(i#") == 1, plan


def test_source_quality_rollup_single_aggregate(spark):
    """Scoring is map-only: exactly one aggregate (the source/lang
    rollup), no joins, no windows."""
    plan = plan_of(spark, "source_quality_rollup")
    assert "Join" not in plan and "Window" not in plan


def test_sequence_packing_no_global_sort(spark):
    """Packing must partition by source — a global (single-partition or
    range) sort would serialize the whole corpus through one task."""
    plan = plan_of(spark, "sequence_packing_bins")
    assert "hashpartitioning(source" in plan, plan
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_stratified_split_map_only_aggregate(spark):
    """Hash-split assignment is a map-side expression: one aggregate,
    no joins, no windows, no rand()."""
    plan = plan_of(spark, "doc_stratified_hash_split")
    assert "Join" not in plan and "Window" not in plan
    assert "rand(" not in plan  # reproducibility: content-addressed, not seeded
    assert "sha2" in plan


def test_attribution_single_window_pass(spark):
    """Last-touch attribution must be ONE window pass over user_id —
    no self-join, no as-of join."""
    plan = plan_of(spark, "event_attribution_last_touch")
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1
    # one shuffle: the user_id window partitioning
    assert plan.count("Exchange") == 2  # tree line + detail block


def test_ann_ivf_candidate_join_is_equi_on_cell(spark):
    """IVF must never cross-join queries against the corpus: the only
    unkeyed join is the broadcast against the 16-row centroid table;
    candidates arrive through an equi-join on the cell id."""
    plan = plan_of(spark, "embedding_ann_ivf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the bounded centroid cross product is broadcast, never shuffled
    assert "hashpartitioning(cent_id" not in plan


def test_ann_signlsh_bucket_join_is_equi(spark):
    """Sign-LSH candidates come from an equi-join on (table, signature)
    — no cross join of queries x corpus anywhere in the plan."""
    plan = plan_of(spark, "embedding_ann_signlsh")
    assert "CartesianProduct" not in plan, plan


def test_pii_redact_is_map_only(spark):
    """PII redaction must be a pure map: no shuffle of any kind."""
    plan = plan_of(spark, "pii_redact_customer_text")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan and "Window" not in plan


def test_key_skew_profile_is_take_ordered(spark):
    """The top-10 heavy keys must come from TakeOrdered (per-partition
    heaps), never a global sort of the per-key counts."""
    plan = plan_of(spark, "key_skew_profile_orders")
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan


def test_rolling_actives_no_range_join(spark):
    """Trailing-7-day actives uses the bounded day-fanout explode —
    the plan must contain no non-equi (nested-loop / cartesian) join."""
    plan = plan_of(spark, "rolling_7d_active_users")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "explode(sequence(" in plan, plan


def test_anomaly_zscore_single_window_pass(spark):
    """Rolling z-score must be one ordered frame pass over user_id —
    no self-join."""
    plan = plan_of(spark, "anomaly_zscore_event_values")
    assert "Join" not in plan, plan
    assert plan.count("Window") >= 1


def test_snapshot_diff_shuffles_digest_not_payload(spark):
    """The full-outer diff join must carry only (key, 32-byte digest):
    payload columns stay out of the join schema."""
    plan = plan_of(spark, "snapshot_diff_orders")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # the digests are computed map-side BELOW the join: the join's own
    # output carries h_a/h_b, never price/status
    join_block = plan[plan.index("FullOuter"):]
    assert "o_totalprice" not in join_block.split("(2)")[0]


def test_ewma_fanout_is_equi_join_on_user(spark):
    """The EWMA predecessor join must hash-shuffle on user_id with the
    row-number distance as a residual range condition — not a nested
    loop."""
    plan = plan_of(spark, "ewma_event_values")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(u" in plan or "SortMergeJoin" in plan, plan


def test_bigram_lm_model_tables_are_aggregates(spark):
    """The LM scoring plan re-joins two vocabulary-sized aggregate
    tables; there must be no cartesian anywhere."""
    plan = plan_of(spark, "bigram_lm_doc_score")
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_stratified_sample_is_map_only_and_deterministic(spark):
    """Digest-based stratified sampling must be a pure map (no shuffle)
    and return the identical row set on re-run."""
    plan = plan_of(spark, "stratified_sample_orders")
    assert "Exchange" not in plan, plan
    a = {r["o_orderkey"] for r in QUERIES["stratified_sample_orders"](spark, SF).collect()}
    b = {r["o_orderkey"] for r in QUERIES["stratified_sample_orders"](spark, SF).collect()}
    assert a == b and len(a) > 0


def test_triangle_count_matches_naive_enumeration(spark):
    """Triangle count from the ordered join must equal a driver-side
    naive enumeration over the (tiny) collected edge list."""
    from itertools import combinations

    from projet5_spark.plans.analytics3 import triangle_count_trade_graph

    row = triangle_count_trade_graph(spark, SF).collect()[0]
    # rebuild edges exactly as the query does, then count naively
    from pyspark.sql import functions as F
    from projet5_spark.sources.readers import fixture_table

    li = fixture_table(spark, SF, "lineitem")
    orders = fixture_table(spark, SF, "orders")
    cust = fixture_table(spark, SF, "customer")
    supp = fixture_table(spark, SF, "supplier")
    edges = {
        (r["a"], r["b"])
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .select(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .distinct()
        .collect()
    }
    nodes = sorted({n for e in edges for n in e})
    naive = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    assert row["n_triangles"] == naive
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(nodes)


def test_er_blocking_finds_every_planted_variant(spark):
    """Each planted variant (custkey ≡ 7 mod 10, last char dropped) is
    edit-distance 1 from its source and shares its block, so total
    matches must be at least the planted count."""
    from pyspark.sql import functions as F

    from projet5_spark.plans.analytics3 import er_blocking_match_stats
    from projet5_spark.sources.readers import fixture_table

    planted = (
        fixture_table(spark, SF, "customer")
        .where(F.col("c_custkey") % 10 == 7)
        .count()
    )
    stats = er_blocking_match_stats(spark, SF)
    total_matches = stats.agg(F.sum("n_matches")).collect()[0][0]
    assert total_matches >= planted > 0


def test_quantile_and_distinct_verdicts_hold(spark):
    """The self-certifying sketch verdicts must be True at fixture
    scale — if a sketch drifts out of tolerance this fails before the
    driver's hash gate does."""
    from projet5_spark.plans.analytics3 import quantile_sketch_verdict_prices
    from projet5_spark.plans.relational import approx_distinct_parts

    q = quantile_sketch_verdict_prices(spark, SF).collect()[0]
    assert q["p50_within_2pct"] and q["p95_within_2pct"]
    a = approx_distinct_parts(spark, SF).collect()[0]
    assert a["parts_within_5pct"] and a["orders_within_5pct"]


def test_resample_interpolation_brackets_and_fills(spark):
    """Every interpolated (unobserved) hour lies within [min, max] of
    the bracketing observed values per series, and the dense grid has
    exactly span x n_series rows."""
    from projet5_spark.plans.analytics3 import events_resample_interpolate

    rows = events_resample_interpolate(spark, SF).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    spans = {len(v) for v in by_type.values()}
    assert len(spans) == 1  # identical dense span per series
    for series in by_type.values():
        series.sort(key=lambda r: r["h"])
        obs = [(i, r["value_interp"]) for i, r in enumerate(series) if r["observed"]]
        assert obs, "each series must have at least one observed hour"
        for i, r in enumerate(series):
            if r["observed"]:
                continue
            prev = [(j, v) for j, v in obs if j < i]
            nxt = [(j, v) for j, v in obs if j > i]
            lo_hi = []
            if prev:
                lo_hi.append(prev[-1][1])
            if nxt:
                lo_hi.append(nxt[0][1])
            lo, hi = min(lo_hi), max(lo_hi)
            # 1e-4 floor grid can dip marginally below the bracket
            assert lo - 1e-4 <= r["value_interp"] <= hi + 1e-4


def test_zorder_key_is_map_only(spark):
    """The Z-order layout key must be a pure map — no shuffle, no
    join, no window anywhere in the plan."""
    plan = plan_of(spark, "zorder_key_orders")
    assert "Exchange" not in plan, plan
    assert "Join" not in plan and "Window" not in plan


def test_compaction_packing_runs_at_metadata_scale(spark):
    """The bin-pack window runs over the aggregated file manifest (one
    row per day), not the raw orders — the aggregate must appear below
    the window in the plan."""
    plan = plan_of(spark, "compaction_bin_packing")
    assert plan.index("HashAggregate") < plan.index("Window") or \
        plan.count("HashAggregate") >= 2


# --------------------------------------------------------------------------
# Batch-6 battery (plans/analytics4.py) + Spark-4 surface (plans/spark4.py)
# --------------------------------------------------------------------------


def test_interval_overlap_has_no_join(spark):
    """The bucket-blocking rewrite's whole point: the overlap THETA join
    becomes explode(sequence(months)) + an equi-keyed aggregate — the
    plan must contain no join node of any kind."""
    plan = plan_of(spark, "interval_overlap_orders_months")
    assert "Join" not in plan, plan
    assert "explode(sequence(" in plan
    assert "CartesianProduct" not in plan


def test_substring_dup_shuffles_digest_not_text(spark):
    """Both shuffles (gram aggregate, doc rollup) must carry the sha-256
    digest / counts — the raw gram text must never be an exchange key."""
    plan = plan_of(spark, "substring_dup_coverage")
    ex = [
        ln
        for ln in plan.splitlines()
        if re.search(r"Arguments: hashpartitioning\(", ln)
    ]
    assert ex, plan
    assert any(re.search(r"hashpartitioning\(dig", ln) for ln in ex), ex
    # no exchange keyed on a raw gram/text column
    assert not any(re.search(r"hashpartitioning\((gram|text)", ln) for ln in ex)


def test_pmi_is_total_order_top20(spark):
    out = QUERIES["pmi_top_collocations"](spark, SF).collect()
    assert 0 < len(out) <= 20
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))
    assert all(r["c12"] >= 20 for r in out)
    # rank order follows (pmi desc, w1, w2)
    keys = [(-r["pmi_micro"], r["w1"], r["w2"]) for r in out]
    assert keys == sorted(keys)


def test_char_entropy_bounds(spark):
    """0 ≤ H ≤ ln(distinct chars in the doc) for every document."""
    import math

    rows = QUERIES["char_entropy_quality"](spark, SF).collect()
    assert rows
    for r in rows:
        assert -1e-4 <= r["char_entropy"] <= math.log(r["n_chars"]) + 1e-4


def test_trend_slope_matches_numpy(spark):
    """The integer-moment slope must equal an independent least-squares
    fit (numpy polyfit) for a sampled user."""
    import numpy as np

    from projet5_spark.sources.readers import read_events

    out = {
        r["user_id"]: r
        for r in QUERIES["user_value_trend_slope"](spark, SF).collect()
    }
    ev = (
        read_events(spark, SF)
        .select(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("x"),
            F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("y"),
        )
        .toPandas()
    )
    checked = 0
    for uid, grp in ev.groupby("user_id"):
        if uid not in out or len(grp) < 2:
            continue
        slope = np.polyfit(grp["x"].to_numpy(), grp["y"].to_numpy(), 1)[0]
        got = out[uid]["slope_micro_cents_per_hour"] / 1e6
        assert abs(got - slope) < 1e-4, (uid, got, slope)
        checked += 1
        if checked >= 5:
            break
    assert checked >= 1


def test_benford_shares_partition_unity(spark):
    rows = QUERIES["benford_first_digit_audit"](spark, SF).collect()
    assert all(1 <= r["digit"] <= 9 for r in rows)
    # floor-quantized shares can undershoot by ≤ 9e-6 total
    assert 1.0 - 1e-4 <= sum(r["share"] for r in rows) <= 1.0
    # the Benford reference itself must partition unity
    full = sum(r["benford_expected"] for r in rows if True)
    if len(rows) == 9:
        assert 1.0 - 1e-4 <= full <= 1.0


def test_decile_lift_is_monotone(spark):
    rows = sorted(
        QUERIES["decile_lift_customers"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    cum = [r["cum_share"] for r in rows]
    assert cum == sorted(cum)
    assert 1.0 - 1e-4 <= cum[-1] <= 1.0
    # deciles are ranked by spend: shares must be non-increasing
    shares = [r["revenue_share"] for r in rows]
    assert all(a >= b - 1e-6 for a, b in zip(shares, shares[1:]))


def test_mad_outliers_matches_pandas(spark):
    """Median / MAD / outlier count recomputed independently in pandas
    for every priority group."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderpriority", "o_totalprice"
    ).toPandas()
    got = {r["pri"]: r for r in QUERIES["mad_outliers_order_price"](spark, SF).collect()}
    for pri, grp in orders.groupby("o_orderpriority"):
        cents = (grp["o_totalprice"] * 100 + 0.5).apply(float).apply(int)
        med = cents.median()
        dv = (cents - med).abs()
        mad = dv.median()
        n_out = int((dv > 3.0 * 1.4826 * mad).sum())
        r = got[pri]
        assert r["n"] == len(grp)
        assert abs(r["median_cents"] - med) < 0.01 + 1e-9
        assert abs(r["mad_cents"] - mad) < 0.01 + 1e-9
        assert r["n_outliers"] == n_out


def test_udtf_runs_match_python_reference(spark):
    """The lateral UDTF output must equal a direct Python run-length
    pass over the same bounded documents."""
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("doc_id") < 50)
        .select("doc_id", "text")
        .collect()
    )
    expect = set()
    for d in docs:
        toks = [t for t in d["text"].split(" ") if t]
        i = 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            if j - i >= 2:
                expect.add((d["doc_id"], i + 1, toks[i], j - i))
            i = j
    got = {
        (r["doc_id"], r["start_pos"], r["token"], r["run_len"])
        for r in QUERIES["udtf_token_runs"](spark, SF).collect()
    }
    assert got == expect


def test_variant_missing_path_is_null_everywhere(spark):
    rows = QUERIES["variant_event_props_stats"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_missing_path"] == r["n"]
        assert r["min_k"] <= r["max_k"]


def test_pipe_syntax_equals_classic_spelling(spark):
    """The |> pipeline must produce exactly the classic query's rows."""
    pipe = QUERIES["pipe_syntax_monthly_revenue"](spark, SF).collect()
    classic = spark.sql(
        f"""
        SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM parquet.`{SF}/orders.parquet` WHERE o_orderstatus = 'F'
        GROUP BY month ORDER BY month
        """
    ).collect()
    assert pipe == classic


def test_listagg_segments_are_sorted(spark):
    rows = QUERIES["listagg_nation_segments"](spark, SF).collect()
    assert rows
    for r in rows:
        parts = r["segments"].split(",")
        assert parts == sorted(parts)


# --------------------------------------------------------------------------
# Batch-7 battery (plans/analytics5.py, sources/pysource.py)
# --------------------------------------------------------------------------


def test_reservoir_uses_window_group_limit(spark):
    """rank ≤ k over the stratum window must prune with per-partition
    top-k heaps (WindowGroupLimit), not full-group sorts."""
    plan = plan_of(spark, "reservoir_sample_per_segment")
    assert "WindowGroupLimit" in plan, plan
    out = QUERIES["reservoir_sample_per_segment"](spark, SF).collect()
    from collections import Counter

    per_seg = Counter(r["c_mktsegment"] for r in out)
    assert all(v == 10 for v in per_seg.values())


def test_concat_offsets_are_a_partition_of_the_corpus(spark):
    """Spans must tile [0, total) without gaps or overlaps, in
    (source, doc_id) order, each doc's width = n_tokens + 1 (EOS)."""
    rows = sorted(
        QUERIES["doc_concat_eos_offsets"](spark, SF).collect(),
        key=lambda r: (r["source"], r["doc_id"]),
    )
    cursor = 0
    for r in rows:
        assert r["seq_start"] == cursor, (r, cursor)
        assert r["seq_end"] == r["seq_start"] + r["n_tokens"] + 1
        cursor = r["seq_end"]


def test_bloom_guarantee_holds(spark):
    """The Bloom contract: zero false negatives, always."""
    r = QUERIES["bloom_membership_verdict"](spark, SF).collect()[0]
    assert r["n_false_negatives"] == 0
    assert r["n_members"] > 0 and r["n_non_members"] > 0
    # FP rate should be small for a 1024-bit filter at fixture fill
    assert r["n_false_positives"] <= 0.1 * r["n_non_members"]


def test_pysource_partition_parallel_and_deterministic(spark):
    """The Python DataSource must plan the requested partitions and
    yield identical rows across reads."""
    from projet5_spark.sources.pysource import FORMAT_NAME, register

    register(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("n", 100)
        .option("numPartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b and len(a) == 100
    import hashlib

    i, dig, bucket = a[7]
    assert dig == hashlib.sha256(str(i).encode()).hexdigest()[:8]
    assert bucket == int(dig, 16) % 100


# --------------------------------------------------------------------------
# Batch-8 battery (plans/analytics6.py)
# --------------------------------------------------------------------------


def test_association_rules_invariants(spark):
    """lift symmetry inputs: conf(a→b) = lift·P(b), supports within
    (0, 1], ranks total-ordered."""
    out = QUERIES["basket_association_rules"](spark, SF).collect()
    assert 0 < len(out) <= 20
    assert [r["rk"] for r in out] == list(range(1, len(out) + 1))
    for r in out:
        assert 0 < r["supp_micro"] <= 1_000_000
        assert 0 < r["conf_ab_micro"] <= 1_000_000
        assert 0 < r["conf_ba_micro"] <= 1_000_000
        assert r["a"] < r["b"]


def test_rfm_scores_cover_grid_and_mass(spark):
    rows = QUERIES["rfm_segmentation"](spark, SF).collect()
    n_customers = (
        spark.read.parquet(f"{SF}/orders.parquet").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_customers
    for r in rows:
        assert 1 <= r["r_score"] <= 5
        assert 1 <= r["f_score"] <= 5
        assert 1 <= r["m_score"] <= 5


def test_ab_zscore_matches_scipy_style_reference(spark):
    """z recomputed from raw values in pure Python/numpy."""
    import math

    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).select("event_type", "value").toPandas()

    def arm(t):
        v = [math.floor(x * 100 + 0.5) for x in ev[ev.event_type == t]["value"]]
        n = len(v)
        mean = sum(v) / n
        var = sum((x - mean) ** 2 for x in v) / (n - 1)
        return n, mean, var

    nt, mt, vt = arm("click")
    nc, mc, vc = arm("view")
    z = (mt - mc) / math.sqrt(vt / nt + vc / nc)
    r = QUERIES["ab_test_zscore_verdict"](spark, SF).collect()[0]
    assert r["n_t"] == nt and r["n_c"] == nc
    assert abs(r["z_micro"] / 1e6 - z) < 1e-3
    assert r["significant"] == (abs(z) > 1.96)


def test_churn_profile_partitions_users(spark):
    from projet5_spark.sources.readers import read_events

    rows = QUERIES["churn_inactivity_profile"](spark, SF).collect()
    n_users = read_events(spark, SF).select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert r["churn_risk"] == (r["days_inactive"] >= 7)


# --------------------------------------------------------------------------
# Batch-9 battery (plans/analytics7.py)
# --------------------------------------------------------------------------


def test_skyline_matches_naive_dominance(spark):
    """Sort-scan frontier must equal the quadratic NOT-EXISTS definition
    computed directly in Python."""
    parts = [
        (r["p_partkey"], int(r["p_retailprice"] * 100 + 0.5), r["p_size"])
        for r in spark.read.parquet(f"{SF}/part.parquet")
        .select("p_partkey", "p_retailprice", "p_size")
        .collect()
    ]
    naive = {
        k
        for (k, pr, sz) in parts
        if not any(
            qp <= pr and qs <= sz and (qp < pr or qs < sz)
            for (_, qp, qs) in parts
        )
    }
    got = {
        r["p_partkey"] for r in QUERIES["skyline_pareto_parts"](spark, SF).collect()
    }
    assert got == naive and got


def test_table_checksum_detects_any_row_change(spark):
    """Checksum must be order-independent but content-sensitive."""
    base = QUERIES["table_content_checksum"](spark, SF).collect()[0]
    # order independence: shuffled input produces the identical checksum
    from projet5_spark.plans.analytics7 import _CHECKSUM_COLS_SPARK

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    h32 = (
        F.conv(
            F.substring(F.sha2(F.expr(_CHECKSUM_COLS_SPARK), 256), 1, 8), 16, 10
        )
        .cast("bigint")
        .alias("h32")
    )
    shuffled = (
        orders.repartition(7)
        .select(h32)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h32").cast("long").alias("sum_h32"),
            F.bit_xor("h32").cast("long").alias("xor_h32"),
        )
        .collect()[0]
    )
    assert tuple(shuffled) == tuple(base)
    # content sensitivity: dropping one row flips sum (and usually xor)
    one_less = (
        orders.where(F.col("o_orderkey") != orders.select("o_orderkey").first()[0])
        .select(h32)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h32").cast("long").alias("sum_h32"),
            F.bit_xor("h32").cast("long").alias("xor_h32"),
        )
        .collect()[0]
    )
    assert one_less["n_rows"] == base["n_rows"] - 1
    assert one_less["sum_h32"] != base["sum_h32"]


def test_hll_verdict_all_within_tolerance(spark):
    rows = QUERIES["hll_partition_union_verdict"](spark, SF).collect()
    assert any(r["month"] == "ALL" for r in rows)
    assert all(r["within_5pct"] for r in rows)


def test_int8_quant_error_bounded_by_step(spark):
    """Round-to-nearest int8 error per element is ≤ scale/254, so
    MSE ≤ (scale/254)² — check the bound for every vector."""
    for r in QUERIES["embedding_int8_quant_error"](spark, SF).collect():
        scale = r["scale_micro"] / 1e6
        mse = r["mse_femto"] / 1e15
        assert mse <= (scale / 254.0) ** 2 * 1.001 + 1e-12, r


# --------------------------------------------------------------------------
# Batch-10 battery (plans/analytics8.py)
# --------------------------------------------------------------------------


def test_cusum_matches_numpy_argmax(spark):
    """Changepoint hour recomputed with a direct numpy cumsum."""
    import numpy as np

    from projet5_spark.sources.readers import read_events

    ev = (
        read_events(spark, SF)
        .select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("h"),
            F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .toPandas()
    )
    got = {
        r["event_type"]: r
        for r in QUERIES["cusum_changepoint_events"](spark, SF).collect()
    }
    for et, grp in ev.groupby("event_type"):
        hourly = grp.groupby("h")["cents"].sum().sort_index()
        s = np.cumsum(hourly.to_numpy() - hourly.mean())
        i = int(np.argmax(np.abs(s)))
        # ties broken by hour asc: numpy argmax takes the first too
        assert got[et]["changepoint_hour"] == hourly.index[i], et
        assert got[et]["n_hours"] == len(hourly)


def test_seasonal_devs_sum_to_zero_weighted(spark):
    """Σ n·seasonal_dev ≈ 0 per type (means decompose additively)."""
    rows = QUERIES["seasonal_hourly_profile"](spark, SF).collect()
    from collections import defaultdict

    acc = defaultdict(float)
    tot = defaultdict(int)
    for r in rows:
        acc[r["event_type"]] += r["n"] * r["seasonal_dev"]
        tot[r["event_type"]] += r["n"]
    for et, s in acc.items():
        # 1e-4 floor grid → worst-case drift ≈ cells · 1e-4 · n
        assert abs(s) <= tot[et] * 2e-4, (et, s)


def test_acf1_in_range_and_matches_numpy(spark):
    import numpy as np

    from projet5_spark.sources.readers import read_events

    ev = (
        read_events(spark, SF)
        .select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("h"),
            F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .toPandas()
    )
    got = {
        r["event_type"]: r["acf1_micro"] / 1e6
        for r in QUERIES["acf_lag1_hourly_by_type"](spark, SF).collect()
    }
    for et, grp in ev.groupby("event_type"):
        hourly = grp.groupby("h")["cents"].sum().sort_index().to_numpy()
        x, y = hourly[:-1].astype(float), hourly[1:].astype(float)
        r = np.corrcoef(x, y)[0, 1]
        assert -1.0 <= got[et] <= 1.0
        assert abs(got[et] - r) < 1e-4, (et, got[et], r)


def test_length_trim_keeps_about_ninety_percent(spark):
    rows = QUERIES["doc_length_trim_stats"](spark, SF).collect()
    n = sum(r["n_docs"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0.85 <= kept / n <= 0.95


# --------------------------------------------------------------------------
# Batch-11 battery (plans/analytics9.py)
# --------------------------------------------------------------------------


def test_winnowing_guarantee_on_planted_match(spark):
    """Two docs sharing a ≥ w+k-1 token run must share ≥ 1 fingerprint
    — the winnowing guarantee, checked on a synthesized pair."""
    from projet5_spark.plans.analytics9 import _WIN_K, _WIN_W, winnowing_fingerprints
    import projet5_spark.plans.analytics9 as a9

    run = " ".join(f"shared{i}" for i in range(_WIN_W + _WIN_K - 1))
    df = spark.createDataFrame(
        [
            (1, f"alpha beta {run} gamma delta epsilon zeta"),
            (2, f"one two three four five {run} six seven"),
        ],
        "doc_id long, text string",
    )
    # drive the same plan over the synthetic docs via the module's
    # internals (fixture_table is bypassed)
    orig = a9._t
    try:
        a9._t = lambda spark, sf_dir, name: df
        out = winnowing_fingerprints(spark, "unused")
        rows = {r["doc_id"]: r for r in out.collect()}
    finally:
        a9._t = orig
    # recompute the fingerprint SETS directly to assert intersection
    import hashlib

    def fps(text):
        toks = text.split(" ")
        hs = [
            int(
                hashlib.sha256(
                    " ".join(toks[i : i + _WIN_K]).encode()
                ).hexdigest()[:12],
                16,
            )
            for i in range(len(toks) - _WIN_K + 1)
        ]
        out = set()
        for i in range(len(hs) - _WIN_W + 1):
            out.add(min(hs[i : i + _WIN_W]))
        return out

    f1, f2 = fps(df.collect()[0]["text"]), fps(df.collect()[1]["text"])
    assert f1 & f2, "planted shared run must yield a shared fingerprint"
    assert rows[1]["n_fingerprints"] == len(f1)
    assert rows[1]["fp_sum"] == sum(f1)


def test_novelty_first_doc_is_fully_novel(spark):
    rows = {r["doc_id"]: r for r in QUERIES["ngram_novelty_decay"](spark, SF).collect()}
    first = min(rows)
    assert rows[first]["novelty_frac"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["novelty_frac"] <= 1.0
        assert r["n_novel"] <= r["n_distinct_shingles"]


def test_rank_with_ties_uses_window_group_limit(spark):
    """rk <= 2 over rank() must prune below the shuffle with per-group
    top-k heaps (rank-mode WindowGroupLimit keeps tie rows), not sort
    whole order groups."""
    plan = plan_of(spark, "rank_with_ties_top_quantity_orders")
    assert "WindowGroupLimit" in plan, plan


def test_novelty_joins_only_at_doc_scale(spark):
    """The per-doc totals and the first-doc novel counts meet in a join
    keyed on doc_id (one row per doc). A regression back to joining
    first_seen onto every (doc, digest) fact row would surface as a
    join keyed on the digest column."""
    plan = plan_of(spark, "ngram_novelty_decay")
    key_lines = [
        ln
        for ln in plan.splitlines()
        if re.search(r"\b(Left|Right) keys", ln) or " join keys" in ln.lower()
    ]
    assert key_lines, plan
    offenders = [
        ln for ln in key_lines if re.search(r"\b(dig|h1|h2)#", ln)
    ]
    assert not offenders, offenders


def test_cdc_conflicts_planted_by_construction(spark):
    r = QUERIES["cdc_batch_conflicts"](spark, SF).collect()[0]
    # key folding (mod 5000 over every 3rd orderkey) guarantees conflicts
    assert r["n_conflicted_keys"] > 0
    assert r["max_ops_per_key"] >= 2
    assert r["batch_rows"] > r["n_conflicted_keys"]


def test_groupingsets_dfapi_has_three_granularities(spark):
    rows = QUERIES["groupingsets_dfapi_region_nation"](spark, SF).collect()
    both = [r for r in rows if r["r_name"] is not None and r["n_name"] is not None]
    region_only = [r for r in rows if r["r_name"] is not None and r["n_name"] is None]
    grand = [r for r in rows if r["r_name"] is None and r["n_name"] is None]
    assert both and region_only and len(grand) == 1
    assert grand[0]["n_customers"] == sum(r["n_customers"] for r in both)


# --------------------------------------------------------------------------
# Batch-12 battery (plans/analytics10.py)
# --------------------------------------------------------------------------


def test_ks_matches_scipy_style_reference(spark):
    """D recomputed from raw cents with a direct two-pointer ECDF scan."""
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).select("event_type", "value").toPandas()

    def cents(t):
        return sorted(
            int(v * 100 + 0.5) for v in ev[ev.event_type == t]["value"]
        )

    a, b = cents("click"), cents("view")
    grid = sorted(set(a) | set(b))
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b)
        )
        for x in grid
    )
    r = QUERIES["ks_test_event_values"](spark, SF).collect()[0]
    assert r["na"] == len(a) and r["nb"] == len(b)
    assert abs(r["ks_d_micro"] / 1e6 - d) < 2e-6


def test_psi_nonnegative_and_binned(spark):
    r = QUERIES["psi_population_stability"](spark, SF).collect()[0]
    # PSI is a sum of (p-q)(ln p - ln q) terms — each nonnegative
    assert r["psi_nano"] >= 0
    assert 1 <= r["n_bins"] <= 10


def test_chi2_matches_pandas_contingency(spark):
    import pandas as pd

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderstatus", "o_orderpriority"
    ).toPandas()
    ct = pd.crosstab(orders["o_orderstatus"], orders["o_orderpriority"])
    n = ct.values.sum()
    e = ct.sum(axis=1).values[:, None] * ct.sum(axis=0).values[None, :] / n
    chi2 = ((ct.values - e) ** 2 / e).sum()
    r = QUERIES["chi_square_status_priority"](spark, SF).collect()[0]
    assert r["n_cells"] == (ct.values > 0).size
    assert abs(r["chi2_micro"] / 1e6 - chi2) < 1e-3


def test_gini_matches_direct_formula(spark):
    import numpy as np

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_totalprice"
    ).toPandas()
    cents = (
        (orders["o_totalprice"] * 100 + 0.5)
        .apply(int)
        .groupby(orders["o_custkey"])
        .sum()
        .sort_values(kind="stable")
        .to_numpy()
    )
    n = len(cents)
    i = np.arange(1, n + 1)
    g = 2.0 * (i * cents).sum() / (n * cents.sum()) - (n + 1.0) / n
    r = QUERIES["gini_revenue_concentration"](spark, SF).collect()[0]
    assert r["n"] == n
    assert abs(r["gini_micro"] / 1e6 - g) < 1e-5
    assert 0.0 <= r["gini_micro"] / 1e6 <= 1.0


# ---------------------------------------------------------------------------
# batch-13 battery: BM25, TF-IDF cosine, spatial grid join, FD audit,
# l-diversity
# ---------------------------------------------------------------------------


def test_bm25_matches_direct_formula(spark):
    import math

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).toPandas()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    terms = ("spark", "merge", "window")
    df = {t: sum(1 for tk in toks.values() if t in tk) for t in terms}
    scores = {}
    for d, tk in toks.items():
        s = 0.0
        for t in terms:
            tf = tk.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log((2 * n_docs - 2 * df[t] + 1) / (2 * df[t] + 1))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(tk) / avgdl))
        if s != 0.0:
            scores[d] = s
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = QUERIES["bm25_topk_docs"](spark, SF).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        # deterministic log truncation ≈1e-7 relative; scores are O(1)
        assert abs(r["score_micro"] / 1e6 - s) < 1e-3


def test_tfidf_cosine_pairs_bounded_and_symmetric_free(spark):
    rows = QUERIES["tfidf_cosine_pairs_topk"](spark, SF).collect()
    assert 0 < len(rows) <= 15
    seen = set()
    for r in rows:
        assert r["doc_a"] < r["doc_b"]  # each unordered pair once
        assert (r["doc_a"], r["doc_b"]) not in seen
        seen.add((r["doc_a"], r["doc_b"]))
        assert -1_000_000 <= r["cos_micro"] <= 1_000_000  # cosine in [-1, 1]
    # descending by similarity
    sims = [r["cos_micro"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_spatial_grid_profile_matches_brute_force(spark):
    pts = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey"
    ).toPandas()["c_custkey"]
    xy = [(k * 2654435761 % 36000, k * 2246822519 % 18000) for k in pts]
    r = QUERIES["spatial_grid_join_profile"](spark, SF).collect()[0]
    assert r["n_points"] == len(xy)
    # brute-force the within-radius count: cell edge == radius means the
    # 3x3 neighborhood can't miss any pair within r
    within = 0
    min_d2 = None
    for i in range(len(xy)):
        for j in range(i + 1, len(xy)):
            d2 = (xy[i][0] - xy[j][0]) ** 2 + (xy[i][1] - xy[j][1]) ** 2
            if d2 <= 2000 * 2000:
                within += 1
    assert r["pairs_within_r"] == within
    assert r["candidate_pairs"] >= within
    assert r["max_cell_pop"] >= 1


def test_fd_audit_control_row_holds(spark):
    rows = {r["fd"]: r for r in QUERIES["fd_audit_g3"](spark, SF).collect()}
    # the nation->region FD is exact in TPC-H: zero violations
    ctrl = rows["nation_key->region_key"]
    assert ctrl["violations"] == 0 and ctrl["g3_micro"] == 0
    for r in rows.values():
        assert 0 <= r["violations"] < r["n_rows"]
        assert 0 <= r["g3_micro"] < 1_000_000
        # violations == n_rows - sum of per-key maxima >= n_rows - ... and
        # a key can keep at least one row: violations <= n_rows - n_keys
        assert r["violations"] <= r["n_rows"] - r["n_keys"]


def test_l_diversity_consistent_with_k_anonymity(spark):
    ldiv = QUERIES["hc_l_diversity_audit"](spark, SF).collect()
    for r in ldiv:
        assert 1 <= r["l"] <= 8  # 8 blood types in the domain
        assert r["l"] <= r["n"]
        assert r["below_l"] == (r["l"] < 3)
    # cells are the (age_band, gender) marginals of the k-anonymity cells
    kan = QUERIES["hc_k_anonymity_audit"](spark, SF).collect()
    marg = {}
    for r in kan:
        marg[(r["age_band"], r["gender"])] = marg.get(
            (r["age_band"], r["gender"]), 0
        ) + r["n"]
    assert {(r["age_band"], r["gender"]): r["n"] for r in ldiv} == marg


# ---------------------------------------------------------------------------
# batch-14 battery: confusion matrix, covariance, backlog sweep-line,
# Merkle digests, zone-map audit, survivorship
# ---------------------------------------------------------------------------


def test_lang_confusion_matrix_totals(spark):
    rows = QUERIES["lang_confusion_matrix"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    # diagonal + off-diagonal cells both exist in the synthetic fixture
    labels = {r["labeled_lang"] for r in rows}
    assert labels == {"en", "fr", "de", "es", "zh"}


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "embedding"
    ).toPandas()["embedding"]
    m = np.array([np.asarray(v, dtype=np.float64) for v in emb])
    rows = QUERIES["embedding_covariance_topvar"](spark, SF).collect()
    assert len(rows) == 10
    for r in rows:
        i, j = r["i"] - 1, r["j"] - 1
        cov = (m[:, i] * m[:, j]).mean() - m[:, i].mean() * m[:, j].mean()
        # micro-grid flooring on sums introduces ~1e-6-scale error
        assert abs(r["cov_nano"] / 1e9 - cov) < 1e-5
    mags = [abs(r["cov_nano"]) for r in rows]
    assert mags == sorted(mags, reverse=True)


def test_backlog_sweepline_nonnegative_and_conserved(spark):
    rows = QUERIES["orders_open_backlog_by_month"](spark, SF).collect()
    assert rows, "backlog must cover the order date range"
    for r in rows:
        assert r["max_open"] >= r["eom_open"] >= 0
    # after the last close event every order is closed again: final month
    # ends at 0 open
    assert rows[-1]["eom_open"] == 0


def test_merkle_digests_roll_up_to_table_checksum(spark):
    buckets = QUERIES["partition_merkle_digests"](spark, SF).collect()
    total = QUERIES["table_content_checksum"](spark, SF).collect()[0]
    assert len(buckets) == 16
    assert sum(b["n_rows"] for b in buckets) == total["n_rows"]
    assert sum(b["sum_h32"] for b in buckets) == total["sum_h32"]
    xor = 0
    for b in buckets:
        xor ^= b["xor_h32"]
    assert xor == total["xor_h32"]


def test_zonemap_sorted_layout_prunes_more(spark):
    rows = {r["layout"]: r for r in QUERIES["zonemap_pruning_audit"](spark, SF).collect()}
    assert rows["natural"]["n_files"] == rows["sorted"]["n_files"] == 32
    # the sorted layout must dominate: more prunable files, smaller scan
    assert rows["sorted"]["prunable"] > rows["natural"]["prunable"]
    assert rows["sorted"]["scan_frac_micro"] < rows["natural"]["scan_frac_micro"]


def test_golden_record_survivor_dominates_cluster(spark):
    import pandas as pd

    cust = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    cust["cluster_id"] = cust["c_custkey"] % 500
    rows = QUERIES["golden_record_survivorship"](spark, SF).collect()
    by_cluster = dict(cust.groupby("cluster_id").size())
    assert len(rows) == len(by_cluster)
    for r in rows[:50]:
        members = cust[cust["cluster_id"] == r["cluster_id"]]
        assert r["n_members"] == len(members)
        best = members.sort_values(
            by=["c_acctbal", "c_custkey"], ascending=False, kind="mergesort"
        ).iloc[0]
        # fixture has no null segments, so balance decides
        assert r["golden_key"] == best["c_custkey"]


# ---------------------------------------------------------------------------
# batch-15 battery: WOE/IV, MinHash gate, OOV rate, assortativity,
# join-size estimate
# ---------------------------------------------------------------------------


def test_woe_iv_matches_direct_formula(spark):
    import math

    import pandas as pd

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_totalprice", "o_orderpriority"
    ).toPandas()
    cents = (orders["o_totalprice"] * 100 + 0.5).apply(int)
    good = orders["o_orderpriority"] == "1-URGENT"
    cuts = [cents.quantile(i / 10, interpolation="linear") for i in range(1, 10)]
    bins = cents.apply(lambda c: sum(1 for q in cuts if q < c))
    rows = QUERIES["woe_iv_price_bins"](spark, SF).collect()
    gt, bt = int(good.sum()), int((~good).sum())
    for r in rows:
        mask = bins == r["bin"]
        g, b = int(good[mask].sum()), int((~good)[mask].sum())
        assert (r["good"], r["bad"]) == (g, b)
        woe = math.log(g * bt) - math.log(b * gt)
        assert abs(r["woe_nano"] / 1e9 - woe) < 1e-5
        iv = (g / gt - b / bt) * woe
        assert abs(r["iv_nano"] / 1e9 - iv) < 1e-5


def test_minhash_gate_estimates_within_bound(spark):
    rows = QUERIES["minhash_jaccard_estimate_gate"](spark, SF).collect()
    assert len(rows) == 20 * 19 // 2
    ok = sum(1 for r in rows if r["within_3sigma"])
    # 3-sigma bound: essentially all pairs must land inside
    assert ok / len(rows) > 0.97
    for r in rows:
        assert 0 <= r["est_milli"] <= 1000
        assert 0 <= r["exact_milli"] <= 1000


def test_vocab_oov_rate_bounds(spark):
    rows = QUERIES["vocab_oov_rate_by_source"](spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["oov_tokens"] <= r["n_tokens"]
        assert 0 <= r["oov_micro"] < 1_000_000


def test_assortativity_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey"
    ).toPandas()
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    ).toPandas()
    c = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    ).toPandas()
    s = spark.read.parquet(f"{SF}/supplier.parquet").select(
        "s_suppkey", "s_nationkey"
    ).toPandas()
    m = (
        li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        .merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(s, left_on="l_suppkey", right_on="s_suppkey")
    )
    m = m[m["c_nationkey"] != m["s_nationkey"]]
    ed = m.groupby(["c_nationkey", "s_nationkey"]).size().reset_index(name="w")
    und = pd.concat([
        ed.rename(columns={"c_nationkey": "u", "s_nationkey": "v"}),
        ed.rename(columns={"s_nationkey": "u", "c_nationkey": "v"}),
    ])
    st = und.groupby("u")["w"].sum()
    x = und["u"].map(st).to_numpy(dtype=np.float64)
    y = und["v"].map(st).to_numpy(dtype=np.float64)
    r_expected = np.corrcoef(x, y)[0, 1]
    r = QUERIES["graph_strength_assortativity"](spark, SF).collect()[0]
    assert r["n"] == len(und)
    assert abs(r["assortativity_micro"] / 1e6 - r_expected) < 1e-5
    assert -1.0 <= r["assortativity_micro"] / 1e6 <= 1.0


def test_join_size_estimate_actual_is_exact(spark):
    import pandas as pd

    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderdate"
    ).toPandas()
    c = o.groupby("o_orderdate").size()
    r = QUERIES["join_size_estimate_audit"](spark, SF).collect()[0]
    assert r["n_keys"] == len(c)
    assert r["actual"] == int((c**2).sum())
    assert r["est"] > 0
    # near-uniform date distribution: the estimate should be tight
    assert r["rel_err_micro"] < 200_000  # < 20% error


# ---------------------------------------------------------------------------
# batch-16 battery: SymSpell fuzzy match, TWAP, cycle-time percentiles
# ---------------------------------------------------------------------------


def test_symspell_finds_all_distance1_pairs(spark):
    import pandas as pd

    names = spark.read.parquet(f"{SF}/customer.parquet").select(
        "c_custkey", "c_name"
    ).toPandas()
    rows = QUERIES["symspell_fuzzy_name_match"](spark, SF).collect()

    def lev1(a, b):
        # same-length strings: distance 1 iff exactly one differing char;
        # fixture names are fixed-width so this brute force is exact
        if len(a) == len(b):
            return sum(1 for x, y in zip(a, b) if x != y) <= 1
        return False

    expected = set()
    recs = list(names.itertuples())
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            a, b = recs[i], recs[j]
            lo, hi = sorted((a.c_custkey, b.c_custkey))
            if lev1(a.c_name, b.c_name):
                expected.add((lo, hi))
    got = {(r["key_a"], r["key_b"]) for r in rows}
    assert got == expected
    for r in rows:
        assert r["lev"] <= 1


def test_twap_matches_direct_computation(spark):
    import pandas as pd

    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "user_id", "CAST(ts AS DATE) AS day", "unix_micros(ts) AS us",
        "CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents"
    ).toPandas()
    rows = QUERIES["twap_event_values_daily"](spark, SF).collect()
    by_key = {(r["user_id"], r["day"]): r for r in rows}
    checked = 0
    for (u, d), g in list(ev.groupby(["user_id", "day"]))[:40]:
        g = g.sort_values(["us", "cents"], kind="mergesort")
        dur = g["us"].shift(-1) - g["us"]
        mask = dur.notna()
        if not mask.any() or dur[mask].sum() == 0:
            continue
        wsum = int((g["cents"][mask] * dur[mask]).sum())
        wtot = int(dur[mask].sum())
        r = by_key[(u, str(d))]
        assert r["twap_centi"] == wsum // wtot
        assert r["n_events"] == int(mask.sum())
        checked += 1
    assert checked > 10


def test_cycle_time_percentiles_ordered(spark):
    rows = QUERIES["cycle_time_percentiles_by_priority"](spark, SF).collect()
    assert len(rows) == 5  # five TPC-H priorities
    for r in rows:
        assert 0 <= r["p50_days"] <= r["p90_days"] <= r["p99_days"]
        assert r["n_orders"] > 0


# ---------------------------------------------------------------------------
# batch-17 battery: OHLC bars, gap ranges, weighted median, layout advisors,
# Mann-Kendall trend
# ---------------------------------------------------------------------------


def test_ohlc_bars_match_direct_computation(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "event_type", "CAST(ts AS DATE) AS day", "unix_micros(ts) AS us",
        "CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents"
    ).toPandas()
    rows = QUERIES["ohlc_daily_event_bars"](spark, SF).collect()
    by_key = {(r["event_type"], r["day"]): r for r in rows}
    checked = 0
    for (t, d), g in list(ev.groupby(["event_type", "day"]))[:40]:
        g = g.sort_values(["us", "cents"], kind="mergesort")
        r = by_key[(t, str(d))]
        assert r["open_centi"] == int(g["cents"].iloc[0])
        assert r["close_centi"] == int(g["cents"].iloc[-1])
        assert r["high_centi"] == int(g["cents"].max())
        assert r["low_centi"] == int(g["cents"].min())
        assert r["n_events"] == len(g)
        checked += 1
    assert checked > 10


def test_gap_ranges_reconstruct_missing_keys(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    keys = sorted(o.loc[o["o_orderstatus"] == "O", "o_orderkey"])
    missing = set(range(keys[0], keys[-1] + 1)) - set(keys)
    rows = QUERIES["orderkey_gap_ranges"](spark, SF).collect()
    got = set()
    for r in rows:
        assert r["gap_len"] == r["gap_end"] - r["gap_start"] + 1
        got.update(range(r["gap_start"], r["gap_end"] + 1))
    assert got == missing
    # ranges are maximal: consecutive ranges never touch
    starts = [r["gap_start"] for r in rows]
    ends = [r["gap_end"] for r in rows]
    assert all(s > e + 1 for s, e in zip(starts[1:], ends))


def test_weighted_median_definition(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    li["cents"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    li["wq"] = li["l_quantity"].astype("int64")
    rows = QUERIES["weighted_median_price_by_flag"](spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        g = li[li["l_returnflag"] == r["flag"]].sort_values("cents")
        tot = int(g["wq"].sum())
        assert r["total_weight"] == tot
        cum = g.groupby("cents")["wq"].sum().sort_index().cumsum()
        expect = int(cum[2 * cum >= tot].index[0])
        assert r["wmedian_centi"] == expect


def test_rle_profile_counts_runs(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    # same total order as the query: the fixture has duplicate
    # (l_orderkey, l_linenumber) keys, so the profiled columns break
    # ties deterministically (see rle_run_profile_lineitem docstring)
    li = li.sort_values(
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_quantity"],
        kind="mergesort",
    )
    rows = {r["col"]: r for r in QUERIES["rle_run_profile_lineitem"](spark, SF).collect()}
    for col in ("l_returnflag", "l_linestatus", "l_quantity"):
        runs = 0
        for _, g in li.groupby("l_orderkey"):
            v = g[col].tolist()
            runs += 1 + sum(1 for a, b in zip(v, v[1:]) if a != b)
        r = rows[col]
        assert r["n_runs"] == runs
        assert r["n_rows"] == len(li)
        assert r["avg_run_len_micro"] == int(len(li) * 1e6 / runs)


def test_dict_advisor_ndv_and_advice(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    rows = {r["col"]: r for r in
            QUERIES["dict_encoding_advisor_lineitem"](spark, SF).collect()}
    for col in ("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey"):
        r = rows[col]
        ndv = li[col].nunique()
        assert r["ndv"] == ndv
        if ndv <= 256:
            assert r["advice"] == "DICT8"
        elif ndv <= 65536:
            assert r["advice"] == "DICT16"
    assert rows["l_returnflag"]["advice"] == "DICT8"


def test_mann_kendall_sign_sum(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "event_type", "CAST(ts AS DATE) AS day",
        "CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents"
    ).toPandas()
    daily = ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    rows = QUERIES["mann_kendall_trend_events"](spark, SF).collect()
    assert len(rows) == daily["event_type"].nunique()
    for r in rows:
        g = daily[daily["event_type"] == r["event_type"]].sort_values("day")
        v = g["cents"].tolist()
        s = sum(
            (1 if v[j] > v[i] else -1 if v[j] < v[i] else 0)
            for i in range(len(v)) for j in range(i + 1, len(v))
        )
        assert r["s_stat"] == s
        assert r["n_days"] == len(v)
        expect_trend = "increasing" if s > 0 else "decreasing" if s < 0 else "flat"
        assert r["trend"] == expect_trend


# ---------------------------------------------------------------------------
# batch-18 battery: containment, prefix dups, Zipf fit, FS linkage, FK orphans
# ---------------------------------------------------------------------------


def _shingle_sets(docs):
    out = {}
    for _, r in docs.iterrows():
        toks = r["text"].split(" ")
        out[r["doc_id"]] = {
            " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else set()
    return out


def test_containment_matches_brute_force(spark):
    from collections import Counter

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    sets = _shingle_sets(docs)
    df = Counter(s for ss in sets.values() for s in ss)
    banded = {d: {s for s in ss if 2 <= df[s] <= 20} for d, ss in sets.items()}
    ids = sorted(banded)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(banded[a] & banded[b])
            if not inter:
                continue
            ca = inter * 10**6 // len(banded[a])
            cb = inter * 10**6 // len(banded[b])
            if max(ca, cb) >= 500_000:
                expected[(a, b)] = (inter, len(banded[a]), len(banded[b]), ca, cb)
    rows = QUERIES["shingle_containment_pairs"](spark, SF).collect()
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter"], r["sz_a"], r["sz_b"], r["cont_a_micro"], r["cont_b_micro"]
        )
        for r in rows
    }
    assert got == expected
    assert len(got) > 0  # planted near-dups must surface


def test_prefix_dup_groups_match_pandas(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    docs["pfx"] = docs["text"].map(lambda t: " ".join(t.split(" ")[:8]))
    g = docs.groupby("pfx")["doc_id"]
    expected = {
        (int(v.min()), int(v.max()), len(v)) for _, v in g if len(v) > 1
    }
    rows = QUERIES["doc_prefix_dup_groups"](spark, SF).collect()
    got = {(r["first_doc"], r["last_doc"], r["n_docs"]) for r in rows}
    assert got == expected
    assert len(got) > 0


def test_zipf_slope_close_to_numpy_fit(spark):
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    from collections import Counter

    cnt = Counter(t for txt in docs["text"] for t in txt.split(" ") if t)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    y = np.log([c for _, c in top])
    x = np.log(np.arange(1, len(top) + 1))
    slope = float(np.polyfit(x, y, 1)[0])
    r = QUERIES["zipf_slope_vocab"](spark, SF).collect()[0]
    assert r["n_terms"] == len(top)
    assert abs(r["slope_micro"] / 1e6 - slope) < 1e-3
    assert 0 <= r["r2_micro"] <= 1_000_000


def _lev(a, b):
    if a == b:
        return 0
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_fs_linkage_planted_pairs_all_link(spark):
    cust = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    recs = []
    for _, c in cust.iterrows():
        bal = int(c["c_acctbal"] * 100 + 0.5)
        recs.append((int(c["c_custkey"]), c["c_name"], int(c["c_nationkey"]),
                     c["c_mktsegment"], bal))
        if c["c_custkey"] % 10 == 7:
            recs.append((int(c["c_custkey"]) + 10000000, c["c_name"][:-1],
                         int(c["c_nationkey"]), c["c_mktsegment"], bal))
    from collections import defaultdict

    blocks = defaultdict(list)
    for r in recs:
        blocks[r[1][9:17]].append(r)
    verdicts = {"link": 0, "possible": 0, "non_link": 0}
    n_planted = 0
    for blk in blocks.values():
        blk.sort()
        for i in range(len(blk)):
            for j in range(i + 1, len(blk)):
                a, b = blk[i], blk[j]
                s = (4_000_000 if _lev(a[1], b[1]) <= 1 else -3_000_000)
                s += 1_500_000 if a[2] == b[2] else -800_000
                s += 1_200_000 if a[3] == b[3] else -600_000
                s += 2_000_000 if abs(a[4] - b[4]) <= 10_000 else -500_000
                v = "link" if s >= 6_000_000 else "possible" if s >= 0 else "non_link"
                verdicts[v] += 1
                if b[0] - a[0] == 10000000:
                    n_planted += 1
                    assert v == "link"  # planted dup agrees on all fields
    rows = {r["verdict"]: r for r in QUERIES["fs_linkage_verdicts"](spark, SF).collect()}
    for v, n in verdicts.items():
        got = rows[v]["n_pairs"] if v in rows else 0
        assert got == n
    assert n_planted > 0


def test_fk_orphan_rates_count_planted(spark):
    import pandas as pd

    rows = {r["fk"]: r for r in QUERIES["fk_orphan_rate_audit"](spark, SF).collect()}
    for fk, child, ckey, parent, pkey in (
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ):
        c = pd.read_parquet(f"{SF}/{child}.parquet", columns=[ckey])[ckey]
        p = set(pd.read_parquet(f"{SF}/{parent}.parquet", columns=[pkey])[pkey])
        planted = c[c % 1000 == 7] + 10_000_000
        allk = pd.concat([c, planted])
        orphans = int((~allk.isin(p)).sum())
        r = rows[fk]
        assert r["n_child"] == len(allk)
        assert r["n_orphans"] == orphans
        assert orphans >= len(planted) > 0
        assert r["orphan_micro"] == orphans * 10**6 // len(allk)


# ---------------------------------------------------------------------------
# batch-19 battery: STL decomposition, Bollinger breakouts, bounce rate,
# recursive-CTE BFS
# ---------------------------------------------------------------------------


def _daily_cents(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "event_type", "CAST(ts AS DATE) AS day",
        "CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS c"
    ).toPandas()
    return ev.groupby(["event_type", "day"])["c"].sum().reset_index(name="v")


def test_stl_decomposition_identity_and_trend(spark):
    daily = _daily_cents(spark)
    rows = QUERIES["stl_naive_decomposition_daily"](spark, SF).collect()
    assert len(rows) > 0
    by_key = {(r["event_type"], r["day"]): r for r in rows}
    for t, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        for i in range(3, len(g) - 3):
            s7 = int(g["v"].iloc[i - 3:i + 4].sum())
            r = by_key[(t, str(g["day"].iloc[i]))]
            assert r["trend_micro"] == s7 * 10**6 // 7
            # additive identity: value = trend + seasonal + residual
            assert (r["trend_micro"] + r["seasonal_micro"] + r["resid_micro"]
                    == r["value_centi"] * 10**6)
    # seasonal means are zero-sum-ish per type: each type's residuals
    # average to ~0 by construction of the weekday means
    import pandas as pd

    df = pd.DataFrame([r.asDict() for r in rows])
    for t, g in df.groupby("event_type"):
        assert abs(g["resid_micro"].mean()) < abs(g["value_centi"].mean()) * 1e6


def test_bollinger_breakouts_verify_sigma_test(spark):
    daily = _daily_cents(spark)
    rows = QUERIES["bollinger_breakout_days"](spark, SF).collect()
    got = {(r["event_type"], r["day"]) for r in rows}
    expected = set()
    for t, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        for i in range(6, len(g)):
            w = g["v"].iloc[i - 6:i + 1]
            v, s1, s2 = int(g["v"].iloc[i]), int(w.sum()), int((w**2).sum())
            if (7 * v - s1) ** 2 > 4 * (7 * s2 - s1 * s1):
                expected.add((t, str(g["day"].iloc[i])))
    assert got == expected
    for r in rows:  # reported invariants hold
        assert r["dev7"] ** 2 > r["band4"]


def test_bounce_rate_against_manual_sessionizer(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "user_id", "event_id", "unix_micros(ts) AS us", "CAST(ts AS DATE) AS day"
    ).toPandas()
    sessions = []
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        cur_n, cur_day, prev = 0, None, None
        for _, r in g.iterrows():
            if prev is None or r["us"] - prev > 1_800_000_000:
                if cur_n:
                    sessions.append((cur_day, cur_n))
                cur_n, cur_day = 0, r["day"]
            cur_n += 1
            prev = r["us"]
        if cur_n:
            sessions.append((cur_day, cur_n))
    import pandas as pd

    sd = pd.DataFrame(sessions, columns=["day", "n"])
    rows = QUERIES["session_bounce_rate_daily"](spark, SF).collect()
    assert len(rows) == sd["day"].nunique()
    for r in rows:
        g = sd[sd["day"].astype(str) == r["day"]]
        assert r["n_sessions"] == len(g)
        assert r["n_bounces"] == int((g["n"] == 1).sum())
        assert r["bounce_micro"] == int((g["n"] == 1).sum()) * 10**6 // len(g)


def test_recursive_bfs_hops_match_networkx_free_bfs(spark):
    from collections import deque

    adj = {n: set() for n in range(25)}
    for n in range(25):
        for m in ((n + 1) % 25, (n + 5) % 25):
            adj[n].add(m)
            adj[m].add(n)
    dist = {0: 0}
    dq = deque([0])
    while dq:
        u = dq.popleft()
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    rows = QUERIES["recursive_cte_bfs_hops"](spark, SF).collect()
    assert {r["nk"]: r["hops"] for r in rows} == dist


# ---------------------------------------------------------------------------
# batch-20 battery: ABC classification, salted join, trending lift,
# multi-touch attribution
# ---------------------------------------------------------------------------


def test_abc_classification_matches_pandas_cumsum(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    li["c"] = (li["l_extendedprice"] * 100 + 0.5).astype("int64")
    rev = li.groupby("l_partkey")["c"].sum().reset_index(name="r")
    rev = rev.sort_values(["r", "l_partkey"], ascending=[False, True])
    tot = int(rev["r"].sum())
    rev["cum"] = rev["r"].cumsum()
    rev["cls"] = rev["cum"].map(
        lambda c: "A" if c * 100 <= tot * 80 else "B" if c * 100 <= tot * 95 else "C"
    )
    rows = {r["abc_class"]: r for r in
            QUERIES["abc_classification_parts"](spark, SF).collect()}
    for cls, g in rev.groupby("cls"):
        r = rows[cls]
        assert r["n_parts"] == len(g)
        assert r["revenue_cents"] == int(g["r"].sum())
        assert r["share_micro"] == int(g["r"].sum()) * 10**6 // tot
    assert sum(r["n_parts"] for r in rows.values()) == len(rev)


def test_salted_join_equals_plain_join(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    c = spark.read.parquet(f"{SF}/customer.parquet")
    plain = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    expected = {r["c_nationkey"]: r["count"] for r in plain}
    rows = QUERIES["salted_join_revenue_by_nation"](spark, SF).collect()
    assert {r["nationkey"]: r["n_orders"] for r in rows} == expected


def test_trending_lift_window_math(spark):
    import pandas as pd

    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    maxd = li["l_shipdate"].max()
    wk2 = li[li["l_shipdate"] > maxd - pd.Timedelta(days=7)]
    wk1 = li[(li["l_shipdate"] <= maxd - pd.Timedelta(days=7))
             & (li["l_shipdate"] > maxd - pd.Timedelta(days=14))]
    c2 = wk2.groupby("l_partkey").size()
    c1 = wk1.groupby("l_partkey").size()
    rows = QUERIES["trending_parts_wow_lift"](spark, SF).collect()
    assert 0 < len(rows) <= 20
    lifts = [r["lift_micro"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["c2"] == int(c2[r["partkey"]])
        assert r["c1"] == int(c1[r["partkey"]])
        assert r["lift_micro"] == r["c2"] * 10**6 // r["c1"]


def test_attribution_credits_match_manual_join(spark):
    import json

    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS us", "props"
    ).toPandas()
    p = ev[ev["event_type"] == "purchase"]
    v = ev[ev["event_type"] == "view"].copy()
    v["campaign"] = v["props"].map(lambda s: int(json.loads(s)["k"]))
    credit, touches = {}, {}
    for _, pr in p.iterrows():
        cand = v[(v["user_id"] == pr["user_id"]) & (v["us"] <= pr["us"])
                 & (pr["us"] - v["us"] <= 7 * 86_400_000_000)]
        for _, vr in cand.iterrows():
            days = int((pr["us"] - vr["us"]) // 86_400_000_000)
            w = 10**6 // (1 + days)
            credit[vr["campaign"]] = credit.get(vr["campaign"], 0) + w
            touches[vr["campaign"]] = touches.get(vr["campaign"], 0) + 1
    rows = QUERIES["multi_touch_attribution_decay"](spark, SF).collect()
    assert {r["campaign"]: r["credit_micro"] for r in rows} == credit
    assert {r["campaign"]: r["n_touches"] for r in rows} == touches


# ---------------------------------------------------------------------------
# batch-21 battery: centroid cosine, decimal verdict, cume_dist/nth_value,
# dead-letter audit
# ---------------------------------------------------------------------------


def test_label_centroids_cosine_in_range_and_complete(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    labels = sorted(emb["label"].unique())
    rows = QUERIES["label_centroid_cosine_matrix"](spark, SF).collect()
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    # cross-check one pair against a float recomputation (loose grid)
    cents = {}
    for lb, g in emb.groupby("label"):
        m = np.stack(g["embedding"].to_numpy())
        gridded = np.floor(m.astype("float64") * 1e6).sum(axis=0)
        cents[lb] = np.floor(gridded / len(g))
    for r in rows:
        a, b = cents[r["label_a"]], cents[r["label_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r["cos_micro"] / 1e6 - cos) < 1e-4
        assert -1_000_000 <= r["cos_micro"] <= 1_000_000


def test_decimal_sum_verdict_booleans_hold(spark):
    r = QUERIES["decimal_exact_sum_verdict"](spark, SF).collect()[0]
    assert r["decimal_matches_cents"] is True
    assert r["double_within_dollar"] is True
    import decimal

    assert decimal.Decimal(r["sum_decimal"]) * 100 == r["sum_cents"]


def test_cume_dist_and_nth_value_semantics(spark):
    supp = spark.read.parquet(f"{SF}/supplier.parquet").toPandas()
    rows = QUERIES["window_cume_dist_nth_value"](spark, SF).collect()
    assert len(rows) == len(supp)
    by_key = {(r["s_nationkey"], r["s_suppkey"]): r for r in rows}
    for nk, g in supp.groupby("s_nationkey"):
        g = g.sort_values(["s_acctbal", "s_suppkey"],
                          ascending=[False, True]).reset_index(drop=True)
        second = (int(g["s_acctbal"].iloc[1] * 100 + 0.5)
                  if len(g) >= 2 else None)
        for i, rec in g.iterrows():
            r = by_key[(nk, rec["s_suppkey"])]
            assert r["cume_micro"] == (i + 1) * 10**6 // len(g)
            assert r["second_bal_cents"] == second


def test_dead_letter_rate_counts_planted_corruption(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr("event_type", "event_id").toPandas()
    rows = {r["event_type"]: r for r in
            QUERIES["json_malformed_rate_audit"](spark, SF).collect()}
    for t, g in ev.groupby("event_type"):
        planted = int((g["event_id"] % 17 == 3).sum())
        r = rows[t]
        assert r["n_events"] == len(g)
        assert r["n_dead_letter"] == planted
        assert planted > 0
        assert r["dead_letter_micro"] == planted * 10**6 // len(g)


# ---------------------------------------------------------------------------
# batch-22 battery: PPJoin prefix filter, conversion histogram, HOF surface,
# schema-evolution union
# ---------------------------------------------------------------------------


def test_ppjoin_finds_every_pair_above_threshold(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    sets = _shingle_sets(docs)
    ids = sorted(sets)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter * 10**6 // union >= 800_000:
                expected[(a, b)] = inter * 10**6 // union
    rows = QUERIES["ppjoin_prefix_filter_pairs"](spark, SF).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard_micro"] for r in rows}
    # the prefix filter is LOSSLESS for Jaccard >= t: exact same pair set
    assert got == expected
    assert len(got) > 0


def test_ppjoin_filter_boundaries_planted(spark, tmp_path):
    """Adversarial boundary cases for the PPJoin length + positional
    filters: pairs sitting EXACTLY on the t=0.8 Jaccard threshold and
    on the length-filter boundary (4*max == 5*min) must survive; a
    just-below pair sharing most of its prefix must not. Each pair
    group uses its own token namespace so no cross-group shingles."""
    import pandas as pd

    def doc(doc_id, toks):
        text = " ".join(toks)
        return {"doc_id": doc_id, "text": text, "lang": "en",
                "source": "planted", "n_chars": len(text)}

    g1 = [f"a{i}" for i in range(11)]          # exact 0.8: 8/10
    g2 = [f"b{i}" for i in range(12)]          # below: 8 shared / union 12
    g3 = [f"c{i}" for i in range(7)]           # length boundary: 4 in 5
    g4 = [f"d{i}" for i in range(8)]           # skewed containment: 4 in 6
    rows = [
        doc(1, g1),                            # 9 shingles
        doc(2, g1[:10] + ["a_x"]),             # 9 shingles, 8 shared
        doc(3, g2),                            # 10 shingles
        doc(4, g2[:10] + ["b_x", "b_y"]),      # 10 shingles, 8 shared
        doc(5, g3[:6]),                        # 4 shingles, subset of 6
        doc(6, g3),                            # 5 shingles
        doc(7, g4[:6]),                        # 4 shingles, subset of 8
        doc(8, g4),                            # 6 shingles
        doc(9, g1),                            # identical twin of 1
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard_micro"]
        for r in QUERIES["ppjoin_prefix_filter_pairs"](
            spark, str(tmp_path)
        ).collect()
    }
    # independently recompute from the planted texts
    sets = _shingle_sets(pd.DataFrame(rows))
    expected = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and inter * 10**6 // union >= 800_000:
                expected[(a, b)] = inter * 10**6 // union
    assert out == expected
    # the cases the filters must get right, spelled out:
    assert out[(1, 2)] == 800_000              # exactly at threshold
    assert (3, 4) not in out                   # just below threshold
    assert out[(5, 6)] == 800_000              # 4*max == 5*min boundary
    assert (7, 8) not in out                   # skew beyond length filter
    assert out[(1, 9)] == 1_000_000            # identical pair
    assert out[(2, 9)] == 800_000              # twin inherits the 0.8 pair


def test_conversion_histogram_counts_users_once(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS us").toPandas()
    buckets = {}
    for u, g in ev.groupby("user_id"):
        v = g.loc[g["event_type"] == "view", "us"]
        p = g.loc[g["event_type"] == "purchase", "us"]
        if len(v) and len(p) and p.min() >= v.min():
            b = int((p.min() - v.min()) // (6 * 3_600_000_000))
            buckets[b] = buckets.get(b, 0) + 1
    rows = QUERIES["conversion_time_histogram"](spark, SF).collect()
    assert {r["bucket_6h"]: r["n_users"] for r in rows} == buckets
    assert sum(buckets.values()) > 0


def test_hof_battery_against_numpy(spark):
    import math

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    rows = {r["vec_id"]: r for r in
            QUERIES["hof_zip_exists_forall_embeddings"](spark, SF).collect()}
    assert len(rows) == len(emb)
    for _, rec in emb.head(50).iterrows():
        e = [float(x) for x in rec["embedding"]]
        grid = sum(math.floor(x * y * 1e6) for x, y in zip(e, reversed(e)))
        r = rows[rec["vec_id"]]
        assert r["revdot_grid"] == grid
        assert r["has_negative"] == any(x < 0 for x in e)
        assert r["all_small"] == all(abs(x) < 10 for x in e)


def test_schema_union_backfills_odd_keys(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    rows = {r["o_orderstatus"]: r for r in
            QUERIES["schema_evolution_union_orders"](spark, SF).collect()}
    for st, g in o.groupby("o_orderstatus"):
        backfilled = int((g["o_orderkey"] % 2 == 1).sum())
        r = rows[st]
        assert r["n_rows"] == len(g)
        assert r["n_backfilled"] == backfilled
        assert r["backfill_micro"] == backfilled * 10**6 // len(g)


# ---------------------------------------------------------------------------
# batch-23 battery: nearest as-of, business days, Q-Q deciles
# ---------------------------------------------------------------------------


def test_nearest_asof_picks_minimum_abs_delta(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "user_id", "event_id", "event_type", "unix_micros(ts) AS us"
    ).toPandas()
    p = ev[ev["event_type"] == "purchase"]
    v = ev[ev["event_type"] == "view"]
    expected = {}
    for _, pr in p.iterrows():
        cand = v[(v["user_id"] == pr["user_id"])
                 & ((v["us"] - pr["us"]).abs() <= 3_600_000_000)]
        if len(cand):
            cand = cand.assign(adt=(cand["us"] - pr["us"]).abs())
            best = cand.sort_values(["adt", "event_id"],
                                    kind="mergesort").iloc[0]
            expected[pr["event_id"]] = (int(best["event_id"]),
                                        int(best["us"] - pr["us"]))
    rows = QUERIES["asof_nearest_view_per_purchase"](spark, SF).collect()
    got = {r["event_id"]: (r["view_event_id"], r["dt_us"]) for r in rows}
    assert got == expected
    assert len(got) > 0
    # both directions occur in the output
    assert any(dt > 0 for _, dt in got.values())
    assert any(dt < 0 for _, dt in got.values())


def test_business_days_closed_form_vs_calendar_walk(spark):
    import datetime as dt

    import pandas as pd

    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    first_ship = li.groupby("l_orderkey")["l_shipdate"].min()
    spans = o.join(first_ship.rename("d2"), on="o_orderkey", how="inner")

    def walk(d1, d2):
        if d2 <= d1:
            return 0
        days = pd.date_range(d1 + pd.Timedelta(days=1), d2)
        return int(sum(1 for d in days if d.weekday() < 5))

    expect = {}
    for pr, g in spans.groupby("o_orderpriority"):
        sample = g.head(30)
        expect[pr] = [walk(r["o_orderdate"], r["d2"])
                      for _, r in sample.iterrows()]
    rows = {r["priority"]: r for r in
            QUERIES["business_days_to_ship_by_priority"](spark, SF).collect()}
    # spot-verify the closed form equals a literal calendar walk by
    # recomputing totals for the full table
    total_by_p = {}
    for pr, g in spans.groupby("o_orderpriority"):
        total_by_p[pr] = sum(walk(r["o_orderdate"], r["d2"])
                             for _, r in g.iterrows())
        assert rows[pr]["n_orders"] == len(g)
    for pr, tot in total_by_p.items():
        assert rows[pr]["total_bdays"] == tot


def test_qq_deciles_monotone_and_match_numpy(spark):
    import numpy as np

    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    rows = QUERIES["qq_decile_points_order_status"](spark, SF).collect()
    assert [r["pct"] for r in rows] == [10 * i for i in range(1, 10)]
    f = np.sort(o.loc[o["o_orderstatus"] == "F", "cents"].to_numpy())
    oo = np.sort(o.loc[o["o_orderstatus"] == "O", "cents"].to_numpy())
    for r in rows:
        q = r["pct"] / 100
        fq = np.quantile(f, q, method="linear")
        oq = np.quantile(oo, q, method="linear")
        assert abs(r["f_centi_cents"] / 100 - fq) < 1
        assert abs(r["o_centi_cents"] / 100 - oq) < 1
        assert r["diff_centi"] == r["f_centi_cents"] - r["o_centi_cents"]
    fc = [r["f_centi_cents"] for r in rows]
    assert fc == sorted(fc)


# ---------------------------------------------------------------------------
# batch-24 battery: scaler params, class weights, split leakage, target
# encoding
# ---------------------------------------------------------------------------


def test_scaler_params_match_numpy(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    m = np.stack(emb["embedding"].to_numpy()).astype("float64")
    rows = {r["dim"]: r for r in
            QUERIES["feature_scaler_params_embeddings"](spark, SF).collect()}
    assert len(rows) == m.shape[1]
    for d in (1, 7, 32, 64):
        col = m[:, d - 1]
        r = rows[d]
        assert r["min_micro"] == int(np.floor(col.min() * 1e6))
        assert r["max_micro"] == int(np.floor(col.max() * 1e6))
        p50 = np.quantile(col, 0.5, method="linear")
        assert abs(r["p50_micro"] / 1e6 - p50) < 2e-6
        iqr = (np.quantile(col, 0.75, method="linear")
               - np.quantile(col, 0.25, method="linear"))
        assert abs(r["iqr_micro"] / 1e6 - iqr) < 2e-6
        assert r["iqr_micro"] >= 0
        assert r["min_micro"] <= r["p50_micro"] <= r["max_micro"]


def test_class_weights_balanced_formula(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").toPandas()
    counts = emb["label"].value_counts()
    tot, k = len(emb), len(counts)
    rows = QUERIES["class_weights_inverse_freq"](spark, SF).collect()
    assert len(rows) == k
    for r in rows:
        n = int(counts[r["label"]])
        assert r["n"] == n
        assert r["weight_micro"] == int(tot * 1e6 / (k * n))
    # weights are inverse to counts: heaviest class has smallest weight
    by_n = sorted(rows, key=lambda r: r["n"])
    ws = [r["weight_micro"] for r in by_n]
    assert ws == sorted(ws, reverse=True)


def test_split_leakage_finds_planted_cross_split_dups(spark):
    import hashlib

    import pandas as pd

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    copies = docs[docs["doc_id"] % 50 == 3].copy()
    copies["doc_id"] = copies["doc_id"] + 1000000
    docs = pd.concat([docs, copies], ignore_index=True)

    def split(doc_id):
        h = hashlib.sha256(f"split:{doc_id}".encode()).hexdigest()
        return "train" if h[:2] < "cc" else "holdout"

    docs["split"] = docs["doc_id"].map(split)
    docs["digest"] = docs["text"].map(
        lambda t: hashlib.sha256(t.encode()).hexdigest())
    train_digests = set(docs.loc[docs["split"] == "train", "digest"])
    expected = {
        int(r["doc_id"]) for _, r in docs.iterrows()
        if r["split"] == "holdout" and r["digest"] in train_digests
    }
    rows = QUERIES["split_leakage_exact_dups"](spark, SF).collect()
    assert {r["holdout_doc_id"] for r in rows} == expected
    assert len(expected) > 0  # planted duplicates must cross the split


def test_target_encoding_shrinks_toward_prior(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = (j["o_totalprice"] * 100 + 0.5).astype("int64")
    prior = j["cents"].sum() / len(j)
    rows = {r["segment"]: r for r in
            QUERIES["target_encoding_segment_smoothed"](spark, SF).collect()}
    for seg, g in j.groupby("c_mktsegment"):
        n, s = len(g), int(g["cents"].sum())
        expect = int((s + 100 * prior) / (n + 100))
        r = rows[seg]
        assert r["n"] == n
        assert r["encoded_cents"] == expect
        # smoothing pulls the encoding strictly between raw mean and prior
        raw = s / n
        lo, hi = sorted((raw, prior))
        assert lo - 1 <= r["encoded_cents"] <= hi + 1


# ---------------------------------------------------------------------------
# batch-25 battery: relational division, NOT IN trap, disc-vs-cont, delta
# advisor
# ---------------------------------------------------------------------------


def test_relational_division_universal_quantifier(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    cnt = li.groupby("l_suppkey").size().reset_index(name="n")
    topp = set(
        cnt.sort_values(["n", "l_suppkey"], ascending=[False, True])
        .head(3)["l_suppkey"]
    )
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    cover = j[j["l_suppkey"].isin(topp)].groupby("o_custkey")["l_suppkey"].nunique()
    expected = set(cover[cover == 3].index)
    rows = QUERIES["relational_division_all_top_suppliers"](spark, SF).collect()
    assert {r["custkey"] for r in rows} == expected
    assert len(expected) > 0  # divisor dense enough to be covered
    for r in rows:
        assert r["n_matched"] == 3


def test_not_in_trap_shows_zero_vs_anti_join(spark):
    rows = {r["predicate"]: r for r in
            QUERIES["not_in_vs_not_exists_null_trap"](spark, SF).collect()}
    assert rows["NOT IN"]["n_rows"] == 0  # the trap
    # NOT EXISTS counts orders from nulled-out customers (key % 100 == 42)
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    expected = int((o["o_custkey"] % 100 == 42).sum())
    assert rows["NOT EXISTS"]["n_rows"] == expected
    assert expected > 0


def test_disc_vs_cont_median_definitions(spark):
    import numpy as np

    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    o["cents"] = (o["o_totalprice"] * 100 + 0.5).astype("int64")
    rows = {r["priority"]: r for r in
            QUERIES["percentile_disc_vs_cont_by_priority"](spark, SF).collect()}
    for pr, g in o.groupby("o_orderpriority"):
        v = np.sort(g["cents"].to_numpy())
        r = rows[pr]
        assert r["n"] == len(v)
        disc = int(np.quantile(v, 0.5, method="inverted_cdf"))
        cont = np.quantile(v, 0.5, method="linear")
        assert r["p50_disc_cents"] == disc
        assert r["p50_cont_centi"] == int(np.floor(cont * 100))
        assert r["definitions_agree"] == (disc * 100 == int(np.floor(cont * 100)))


def test_delta_advisor_orderkey_is_delta_friendly(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    # same TOTAL order as the query/oracle window (the profiled columns
    # break (orderkey, linenumber) ties — see the query docstring)
    li = li.sort_values(
        ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    )
    rows = {r["col"]: r for r in
            QUERIES["delta_encoding_advisor_lineitem"](spark, SF).collect()}
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        d = li[col].diff().dropna()
        r = rows[col]
        assert r["n_deltas"] == len(d)
        assert r["max_abs_delta"] == int(d.abs().max())
        small = int((d.abs() < 128).sum())
        assert r["small_delta_micro"] == small * 10**6 // len(d)
    # orderkey is sorted => deltas tiny => DELTA; random FKs => PLAIN
    assert rows["l_orderkey"]["advice"] == "DELTA"
    assert rows["l_partkey"]["advice"] == "PLAIN"


# ---------------------------------------------------------------------------
# batch-26 battery: Poisson bootstrap CI, unrolled k-core
# ---------------------------------------------------------------------------


def test_poisson_bootstrap_weights_and_ci(spark):
    import hashlib

    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "event_id", "CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents"
    ).toPandas()
    cdf = (367879, 735758, 919698, 981011, 996340)

    def w(eid, b):
        # replicate b reads 8-hex window (b-1)%8 of digest (b-1)//8
        h, j = divmod(b - 1, 8)
        hexd = hashlib.sha256(f"boot:{eid}:{h}".encode()).hexdigest()
        u = int(hexd[8 * j : 8 * j + 8], 16) % 10**6
        for k, t in enumerate(cdf):
            if u < t:
                return k
        return 5

    means = []
    for b in range(1, 21):
        ws = ev["event_id"].map(lambda e: w(e, b))
        means.append(int((ws * ev["cents"]).sum()) * 10**6 // int(ws.sum()))
    r = QUERIES["poisson_bootstrap_ci_event_mean"](spark, SF).collect()[0]
    assert r["n_events"] == len(ev)
    assert r["boot_lo_micro"] == min(means)
    assert r["boot_hi_micro"] == max(means)
    assert r["mean_micro"] == int(ev["cents"].sum()) * 10**6 // len(ev)
    # the CI brackets the full-data mean
    assert r["boot_lo_micro"] <= r["mean_micro"] <= r["boot_hi_micro"]


def test_kcore_unroll_reaches_fixpoint_and_is_true_kcore(spark):
    rows = QUERIES["kcore3_trade_graph_unrolled"](spark, SF).collect()
    got = {r["nationkey"]: r["degree"] for r in rows}
    # recompute the true k-core by peeling to fixpoint in python
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    o = spark.read.parquet(f"{SF}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{SF}/customer.parquet").toPandas()
    s = spark.read.parquet(f"{SF}/supplier.parquet").toPandas()
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(c, left_on="o_custkey", right_on="c_custkey")
           .merge(s, left_on="l_suppkey", right_on="s_suppkey"))
    j = j[j["c_nationkey"] != j["s_nationkey"]]
    j["a"] = j[["c_nationkey", "s_nationkey"]].min(axis=1)
    j["b"] = j[["c_nationkey", "s_nationkey"]].max(axis=1)
    w = j.groupby(["a", "b"]).size()
    thr = 1.1 * w.sum() / len(w)
    E = set(w[w >= thr].index)
    rounds_needed = 0
    while True:
        deg = {}
        for a, b in E:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= 3}
        E2 = {(a, b) for a, b in E if a in keep and b in keep}
        if E2 == E:
            break
        E, rounds_needed = E2, rounds_needed + 1
    # the fixture must converge within the plan's unroll budget — if
    # this fails, raise _KCORE_ROUNDS
    assert rounds_needed <= 3
    deg = {}
    for a, b in E:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    assert got == deg
    assert all(d >= 3 for d in got.values())


# ---------------------------------------------------------------------------
# batch-27 battery: eventually-follows, KL divergence, densify, rank ties
# ---------------------------------------------------------------------------


def test_eventually_follows_against_manual_sessionizer(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "user_id", "event_id", "event_type", "unix_micros(ts) AS us"
    ).toPandas()
    firsts = {}
    total = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"], kind="mergesort")
        sid, prev = 0, None
        sess_first = {}
        for _, r in g.iterrows():
            if prev is None or r["us"] - prev > 1_800_000_000:
                if sess_first:
                    firsts[(r["user_id"], sid)] = sess_first
                    sess_first = {}
                sid += 1
            if r["event_type"] not in sess_first:
                sess_first[r["event_type"]] = r["us"]
            prev = r["us"]
        if sess_first:
            firsts[(g["user_id"].iloc[0], sid)] = sess_first
    total = len(firsts)
    from collections import Counter

    expect = Counter()
    for sf_ in firsts.values():
        for a, ua in sf_.items():
            for b, ub in sf_.items():
                if a != b and ua < ub:
                    expect[(a, b)] += 1
    rows = QUERIES["eventually_follows_support"](spark, SF).collect()
    got = {(r["type_a"], r["type_b"]): r["n_sessions"] for r in rows}
    assert got == dict(expect)
    for r in rows:
        assert r["support_micro"] == r["n_sessions"] * 10**6 // total


def test_kl_divergence_nonnegative_and_matches_numpy(spark):
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    docs["bkt"] = docs["n_chars"] // 100
    buckets = sorted(docs["bkt"].unique())
    k = len(buckets)
    corp = docs.groupby("bkt").size()
    nc = len(docs)
    rows = {r["source"]: r for r in
            QUERIES["kl_divergence_doc_lengths"](spark, SF).collect()}
    for src, g in docs.groupby("source"):
        per = g.groupby("bkt").size()
        ns = len(g)
        kl = 0.0
        for b in buckets:
            ps = (per.get(b, 0) + 1) / (ns + k)
            pc = (corp[b] + 1) / (nc + k)
            kl += ps * np.log(ps / pc)
        # detmath log has ~1e-7 relative error; grid is 1e-9
        assert abs(rows[src]["kl_nano"] / 1e9 - kl) < 1e-4
    assert len(rows) == docs["source"].nunique()


def test_densified_grid_is_complete_and_zero_flagged(spark):
    from projet5_spark.sources.readers import read_events

    ev = read_events(spark, SF).selectExpr(
        "event_type", "CAST(ts AS DATE) AS day").toPandas()
    n_days = (ev["day"].max() - ev["day"].min()).days + 1
    n_types = ev["event_type"].nunique()
    rows = QUERIES["events_daily_densified_zero_fill"](spark, SF).collect()
    assert len(rows) == n_days * n_types
    obs = ev.groupby(["event_type", "day"]).size()
    for r in rows[:200]:
        key = (r["event_type"], r["day"])
        n = int(obs.get((r["event_type"],
                         __import__("pandas").Timestamp(r["day"]).date()), 0))
        assert r["n_events"] == n
        assert r["zero_filled"] == (n == 0)
    assert any(r["zero_filled"] for r in rows) or (obs > 0).all()


def test_rank_ties_admit_extra_rows(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").toPandas()
    li = li[li["l_orderkey"] % 20 == 0].copy()
    li["qty"] = li["l_quantity"].astype("int64")
    expected = set()
    tie_groups = 0
    for ok, g in li.groupby("l_orderkey"):
        ranks = g["qty"].rank(method="min", ascending=False)
        keep = g[ranks <= 2]
        if len(keep) != min(2, len(g)):
            tie_groups += 1  # divergent-semantics case actually fired
        expected |= {(int(ok), int(r["l_linenumber"])) for _, r in keep.iterrows()}
    rows = QUERIES["rank_with_ties_top_quantity_orders"](spark, SF).collect()
    assert {(r["orderkey"], r["linenumber"]) for r in rows} == expected
    # ties must exist somewhere or the exhibit is vacuous
    sizes = {}
    for r in rows:
        sizes[r["orderkey"]] = sizes.get(r["orderkey"], 0) + 1
    assert tie_groups > 0 or any(n > 2 for n in sizes.values())


def _scan_counts(spark, name: str) -> dict[str, int]:
    """Parquet-scan multiplicity per table in the executed plan (eager
    localCheckpoints run at build; their subtree counts as zero scans,
    which is exactly the materialize-once claim under test)."""
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    counts: dict[str, int] = {}
    for m in re.finditer(r"Scan parquet[^\n]*?(\w+)\.parquet", plan):
        counts[m.group(1)] = counts.get(m.group(1), 0) + 1
    return counts


def test_scd2_pit_reads_fact_once(spark):
    """The PIT join derives v1/v2/changes/probes from ONE materialized
    rank slice — regressing to per-branch re-derivation multiplies the
    fact-wide window by the consumer count (8 scans before the fix)."""
    assert _scan_counts(spark, "scd2_point_in_time_join").get("orders", 0) <= 1


def test_assortativity_builds_edges_once(spark):
    """The 4-table edge aggregate must feed symmetrize/strength/points
    from one materialization, not re-run per consumer (6x before)."""
    counts = _scan_counts(spark, "graph_strength_assortativity")
    for t in ("lineitem", "orders", "customer", "supplier"):
        assert counts.get(t, 0) <= 1, counts


def test_substring_coverage_hashes_grams_once(spark):
    """Both consumers of the gram digests (dup build + probe) must read
    the materialized relation — zero parquet scans and zero sha
    pipelines downstream of the checkpoint."""
    df = QUERIES["substring_dup_coverage"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in plan, plan[:500]
    assert "sha2" not in plan


def test_dq_checks_one_pass_per_scan_shape(spark):
    """Row-local checks fold into one aggregate per table: orders is
    read for (scalars, PK groupBy, anti-join build) and lineitem for
    (scalars, anti-join probe) — seven scans before the fold."""
    counts = _scan_counts(spark, "dq_constraint_checks")
    assert counts.get("orders", 0) <= 3, counts
    assert counts.get("lineitem", 0) <= 2, counts


def test_fk_orphan_plants_via_explode_not_self_union(spark):
    """Planting orphans must not re-scan the child: each child appears
    once as child (explode) and once where it serves as a parent."""
    counts = _scan_counts(spark, "fk_orphan_rate_audit")
    assert counts.get("lineitem", 0) <= 2, counts
    assert counts.get("orders", 0) <= 2, counts
    assert counts.get("customer", 0) <= 2, counts


def test_flagship_fused_plan_shape(spark):
    """Pins the round-7 flagship restructure (plans/healthcare.py):
    the R7 full-row dedup is fused into the R13 window (subsumption
    proof in the healthcare_pipeline docstring), so the physical plan
    carries exactly one Window — compiled with a WindowGroupLimit
    below the shuffle — at most the dim branch's two hash aggregates
    (an R7 regression would add a full-width fact aggregate + its
    exchange), one broadcast (the key map; the fact side never
    broadcast-builds), and two parquet scans (fact + dim branches)."""
    import re

    df = QUERIES["hc_admissions_first_seen"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", plan)) == 2, plan[:400]
    assert len(re.findall(r"\bWindow\b", plan)) == 1
    assert len(re.findall(r"WindowGroupLimit", plan)) >= 1
    aggs = len(re.findall(r"HashAggregate", plan)) + len(
        re.findall(r"SortAggregate", plan)
    ) + len(re.findall(r"ObjectHashAggregate", plan))
    assert aggs <= 2, f"unexpected aggregate count {aggs}"
    assert len(re.findall(r"BroadcastExchange", plan)) == 1


def test_partitioned_write_scan_prunes_partitions(spark):
    """partitioned_write_pruned_scan_orders claims directory-level
    pruning: the status predicate must appear as a PartitionFilter on
    the scan of the partitioned copy (resolved from the file listing,
    reading ONLY the o_orderstatus=F directory), not as a row-level
    PushedFilter over all partitions."""
    plan = plan_of(spark, "partitioned_write_pruned_scan_orders")
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "o_orderstatus" in pf[0], pf[0]


def test_packed_dedup_is_pure_hash_aggregate(spark):
    """The packed-decimal first-seen dedup must plan as HashAggregate
    with NO SortAggregate anywhere — the whole point of the DECIMAL(38)
    packing (min/min_by over structs are not hash-aggregable and
    sort-aggregated 60M rows at x100: 8 GB of spill)."""
    plan = plan_of(spark, "dedup_first_lineitem_per_order")
    assert "HashAggregate" in plan, plan
    assert "SortAggregate" not in plan, plan
    assert "ObjectHashAggregate" not in plan, plan


def test_sized_sort_parallelism_floors_at_config(spark):
    """At fixture scale the size-derived pre-window repartition must
    return exactly spark.sql.shuffle.partitions (plans unchanged where
    they were already fine), and scale with bytes when the input grows
    past bytes_per_task * floor."""
    from projet5_spark.operators.partitioning import (
        input_size_bytes,
        sized_sort_parallelism,
    )

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert sized_sort_parallelism(li) == floor
    size = input_size_bytes(li)
    assert size and size > 0
    # force the data-derived branch: 1-byte tasks -> capped count
    # (the floor outranks a cap below it by design)
    assert sized_sort_parallelism(li, bytes_per_task=1, cap=7) == floor
    assert sized_sort_parallelism(li, bytes_per_task=1, cap=floor + 5) == floor + 5
    got = sized_sort_parallelism(li, bytes_per_task=max(1, size // 100))
    assert floor <= got <= 4096


def test_incremental_ingest_prunes_to_the_batch(spark):
    """The batch-29 incremental near-dup ingest must push the batch
    boundary into the scans: the new-docs parquet scan carries the
    doc_id >= lo pushed filter, and the pair join's batch side is
    filtered BEFORE the pair aggregate (the relation sizes must be
    batch-scale, not corpus-scale — the whole point of incremental)."""
    plan = plan_of(spark, "incremental_near_dup_ingest")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("GreaterThanOrEqual(doc_id" in ln for ln in pushed), plan
    # the >= boundary must appear as a Filter feeding the pair join's
    # build/probe side too (the materialized shingle relation)
    assert re.search(r"Condition : .*doc_id#\d+L >= \d+", plan), plan


def test_hard_negative_centroids_broadcast_not_crossjoin(spark):
    """Hard-negative mining joins n·d exploded vector rows against the
    k·d centroid table: the centroid side must BROADCAST (hash join on
    the dim key with the label-inequality residual) — never a
    cartesian/broadcast-nested-loop product, which would be n·k·d²."""
    plan = plan_of(spark, "hard_negative_mining_centroids")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_cluster_quality_keep_top1_windows_share_one_shuffle(spark):
    """The per-cluster top-1 (row_number + count over cluster_rep) must
    plan its two window functions over ONE cluster_rep exchange — a
    second shuffle of the doc-scale relation would double the
    join-output traffic at corpus scale."""
    plan = plan_of(spark, "near_dup_cluster_quality_keep")
    exchanges = re.findall(r"Exchange hashpartitioning\(cluster_rep", plan)
    assert len(exchanges) <= 1, plan


def test_parameterized_sql_pushes_bound_filters(spark):
    """Named-marker parameters must fold to literals BEFORE optimization
    so the scan still sees constant predicates — the pushdown half of
    the parameterized-SQL contract."""
    plan = plan_of(spark, "parameterized_sql_orders")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("o_orderdate" in ln and "o_totalprice" in ln for ln in pushed), plan


def test_sql_udf_inlines_no_python_eval(spark):
    """SQL scalar UDFs must inline into the Catalyst plan: no Python
    evaluation node anywhere, and the banding CASE visible as a plain
    expression (the whole point vs @F.udf)."""
    plan = plan_of(spark, "sql_udf_margin_bands")
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan
    assert "CASE WHEN" in plan, plan


def test_psi_monitor_broadcasts_reference(spark):
    """The drift monitor's reference table (≤8 bins) must broadcast
    back to the months×bins relation — shuffling the monthly counts
    against an 8-row table would be a wasted exchange at any scale."""
    plan = plan_of(spark, "psi_monthly_drift_monitor")
    assert "BroadcastHashJoin" in plan, plan


def test_jl_projection_broadcasts_sign_matrix(spark):
    """JL projection joins n·d exploded vector rows against the d·k
    sign matrix: the matrix side must broadcast-hash-join on the dim
    key — never a cartesian product."""
    plan = plan_of(spark, "jl_projection_distortion")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_signal_matrix_fusion_joins_are_keyed(spark):
    """The multi-signal fusion must stay pair-keyed: the two full-outer
    merges on (doc_a, doc_b) compile to sort-merge joins, never a
    nested loop or cartesian, at any corpus size. (The upstream family
    pipelines contain BroadcastNestedLoopJoins by design — each is a
    1-row scalar-threshold attach, the audited class — so the assert
    targets the fusion joins specifically.)"""
    plan = plan_of(spark, "near_dup_signal_matrix")
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin FullOuter") == 2, plan[:2000]
    for line in plan.splitlines():
        if "FullOuter" in line or "LeftOuter" in line:
            assert "NestedLoop" not in line, line
