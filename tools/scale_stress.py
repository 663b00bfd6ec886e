"""Scale-up stress harness: run the heavy catalog queries at N x sf0.1.

The fixture benchmarks prove correctness and local latency, but the 100 TB
story rests on claims about *scaling behavior* — partitioning holds, no
spill, no driver-side state, wall grows ~linearly with data. This tool
turns those claims into measurements:

1. **Synthesize** an ``N x sf0.1`` dataset under ``.stress/x{N}/`` (same
   file-per-table layout the readers expect). Each fact/dim table is
   replicated N times with per-replica key shifts so entity counts and
   join cardinalities scale LINEARLY — naive row duplication would
   instead multiply matches per key and quadratically inflate joins,
   which is a different (wrong) workload:

   * ``orders``/``lineitem``: order/part/supp keys shift by
     ``replica * (max_key + 1)``; dates stay — a day simply has N x the
     orders, which is what a larger business looks like, and per-group
     aggregate state grows accordingly.
   * ``customer``/``supplier``/``part``: primary keys shift in lockstep
     with the fact-side foreign keys; nation FKs stay (25 nations at any
     scale — the realistic fixed-dim shape AQE must broadcast).
   * ``events``: event/user ids shift, timestamps stay (denser traffic;
     window/session state per user stays bounded, concurrent users
     scale).
   * ``region``/``nation``/``documents``/``embeddings``: copied as-is
     (the driver's own sf-step fixtures hold documents/embeddings flat,
     TESTDATA.md).

   Scaled tables are written with enough parquet files that scans start
   wide (the single-file fixtures start at 1 split; SCALING.md
   "Local-fixture caveats").

2. **Run** a battery of the heaviest relational/event queries once each
   (noop sink, same execution contract as bench.py) and report per-query
   wall plus the run-stats that matter at scale: failed tasks, spilled
   bytes, shuffle volume.

3. **Documents mode** (``--docs-mult N``): the similarity/near-dup
   family is the 100 TB claim that matters most, and naive doc
   replication is maximally wrong for it — N copies of every doc make
   every cross-replica pair a near-dup, inflating pair mass
   quadratically. Instead each replica applies a BIJECTIVE per-token
   rename (token -> token + "q" + rep) plus a doc_id shift: within a
   replica every exact-dup / shingle / TF-IDF / prefix-filter
   relationship is preserved verbatim (same token counts, lengths +2,
   same df distribution per replica), while across replicas token sets
   are disjoint, so Jaccard/cosine/containment are ~0 and dup mass,
   LSH bucket sizes, candidate counts, and cluster counts all scale
   LINEARLY — the shape of a genuinely larger corpus. Runs the
   ``DOC_BATTERY`` (near-dup + text-similarity queries); other tables
   are symlinked from the base fixture.

Usage::

    python tools/scale_stress.py                    # x100 (~sf10), default battery
    python tools/scale_stress.py --mult 10          # x10 (~sf1)
    python tools/scale_stress.py --mult 100 q01_pricing_summary ...
    python tools/scale_stress.py --keep             # reuse existing dataset
    python tools/scale_stress.py --docs-mult 20     # 100k-doc similarity battery
    python tools/scale_stress.py --emb-mult 100     # 200k-vector ANN battery

The dataset lands under the repo's ``.stress/`` (gitignored) and is
rebuilt only when absent or ``--mult`` changes the directory.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from projet5_spark.plans import QUERIES  # noqa: E402
from projet5_spark.session import ensure_utc, get_spark  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: key columns shifted per replica: table -> [(column, base-key column)]
#: where the shift unit is max(base-key column over the base table) + 1,
#: shared across tables so fact FKs track their dim PKs exactly.
KEY_FAMILIES = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
}

COPY_AS_IS = ("region", "nation", "documents", "embeddings")

#: Disk-capacity preflight constants, calibrated from the measured
#: curves (SCALING.md round-11): the x500 docs probe died mid-run on
#: ENOSPC after ~85 GB of transient shuffle files against 76 GB free —
#: an hour burned learning what arithmetic already knew. Peak transient
#: bytes per mult unit, from the worst measured point of each mode:
#: docs x200 ran the full battery inside ~35 GB of shuffle scratch and
#: x500 needed ~85+ GB → ~0.18 GB/mult with the exact ground-truth
#: arms; facts x100 stays under ~15 GB (~0.15 GB/mult); embeddings are
#: broadcast-heavy map passes, ~0.05 GB/mult ceiling at x50. The
#: dataset itself adds base-fixture-bytes x mult. Estimates are
#: deliberately ~1.2x-conservative: a preflight that fails a run the
#: box could barely fit costs a flag; ENOSPC mid-battery costs an hour.
SCRATCH_GB_PER_MULT = {"documents": 0.18, "facts": 0.15, "embeddings": 0.05}


def disk_preflight(mode: str, mult: int, out_dir: str, force: bool) -> None:
    """Fail fast when the box cannot hold dataset + peak shuffle
    scratch for this run, printing the per-node cluster math instead
    of burning the synthesis + partial battery before ENOSPC."""
    import shutil as _sh

    base_tables = (
        ["documents"] if mode == "documents"
        else ["embeddings"] if mode == "embeddings"
        else ["orders", "lineitem", "customer", "supplier", "part", "events"]
    )
    base_bytes = sum(
        os.path.getsize(os.path.join(BASE_SF, f"{t}.parquet"))
        for t in base_tables
        if os.path.isfile(os.path.join(BASE_SF, f"{t}.parquet"))
    )
    dataset_gb = base_bytes * mult / 1e9
    scratch_gb = SCRATCH_GB_PER_MULT[mode] * mult
    need_gb = (dataset_gb + scratch_gb) * 1.2
    have_gb = _sh.disk_usage(os.path.dirname(out_dir) if
                             os.path.isdir(os.path.dirname(out_dir))
                             else REPO).free / 1e9
    # already-synthesized dataset (--keep) is not a new cost
    if os.path.isdir(out_dir):
        existing = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(out_dir) for f in fs
        )
        need_gb -= existing / 1e9
    print(
        f"preflight[{mode} x{mult}]: dataset ~{dataset_gb:.1f} GB + "
        f"peak scratch ~{scratch_gb:.1f} GB (x1.2 margin) = "
        f"~{max(need_gb, 0):.1f} GB needed; {have_gb:.1f} GB free",
        flush=True,
    )
    if need_gb <= have_gb:
        return
    nodes = int(need_gb / max(have_gb, 1) + 1)
    msg = (
        f"preflight: x{mult} {mode} needs ~{need_gb:.0f} GB but only "
        f"{have_gb:.0f} GB is free — this is the single-box disk "
        f"ceiling, not an engine limit (on a {nodes}+-node cluster the "
        f"shuffle spreads to ~{need_gb / nodes:.0f} GB/node of local "
        f"disk, well inside standard executor provisioning). "
        f"Use --force-disk to attempt anyway."
    )
    if force:
        print("WARNING " + msg, flush=True)
        return
    raise SystemExit(msg)

#: Heavy battery: multi-join TPC-H-ish, wide aggregates, windows, the
#: flagship (derives from orders, so it scales with the fact), and the
#: event-time family. Similarity/text queries are excluded on purpose:
#: documents/embeddings stay flat (see module docstring).
DEFAULT_BATTERY = [
    "q01_pricing_summary",
    "q07_volume_shipping",
    "q08_market_share",
    "q18_large_volume_customers",
    "q21_waiting_orders",
    "q02_min_cost_supplier",
    "dedup_first_lineitem_per_order",
    "window_running_revenue",
    "cycle_time_percentiles_by_priority",
    "weighted_median_price_by_flag",
    "salted_join_revenue_by_nation",
    "fk_orphan_rate_audit",
    "scd2_point_in_time_join",
    "interval_overlap_orders_months",
    "rle_run_profile_lineitem",
    "delta_encoding_advisor_lineitem",
    "approx_distinct_parts",
    "hc_admissions_first_seen",
    "session_windows_per_user",
    "rolling_7d_active_users",
    "tumbling_window_event_stats",
    "key_skew_profile_orders",
    # the global-rank family (round-7 distributed rewrites)
    "zonemap_pruning_audit",
    "quantile_sketch_verdict_prices",
    "weighted_sample_orders_aes",
    "decile_lift_customers",
    "rfm_segmentation",
    "skyline_pareto_parts",
    # round-9 batch-29 split/fold passes (map + bounded agg over facts)
    "temporal_split_embargo",
    "stratified_kfold_assignment",
    # round-9 batch-30 drift monitor (fixed-bin map + bounded aggs)
    "psi_monthly_drift_monitor",
    # round-9 batch-32 survival curve (customer-scale agg + tiny window)
    "kaplan_meier_customer_survival",
]

#: Documents-mode battery: the similarity-join / near-dup family plus
#: the text-analysis passes whose cost is corpus-scale. bm25/top-terms
#: are excluded: their fixed query terms only match replica-0 tokens
#: after the rename, so their pruned-postings work would not scale.
DOC_BATTERY = [
    "doc_exact_dedup",
    "minhash_lsh_near_dup",
    "simhash_near_dup",
    "ngram_jaccard_near_dup",
    "ppjoin_prefix_filter_pairs",
    "shingle_containment_pairs",
    "tfidf_cosine_pairs_topk",
    "winnowing_fingerprints",
    "winnowing_near_dup_pairs",
    "ngram_novelty_decay",
    "doc_repetition_quality",
    "near_dup_clusters",
    "curation_pipeline_end_to_end",
    # round-9 batch-29 corpus-lifecycle passes
    "incremental_near_dup_ingest",
    "near_dup_cluster_quality_keep",
    "source_temperature_mixture",
    # round-9 batch-30 span-level decontamination
    "decontamination_span_offsets",
    # round-9 batch-31 per-source quality cap
    "source_quality_cap_topk",
    # round-10 additions: certified sha-grid SimHash twin; the
    # maintained-shingle-index ingest (index write + probe-from-index)
    "simhash_sha_near_dup",
    "shingle_index_incremental_ingest",
    # round-12 multi-signal fusion: three pair families joined into the
    # audit matrix + the union-graph keep/drop verdict
    "near_dup_signal_matrix",
    "multi_signal_dedup_verdict",
]


#: Embeddings-mode battery: the similarity-search / ANN family plus the
#: vector-profile passes whose cost is corpus-scale. The recall gates
#: compute brute-force truth AND the bucketed path inside one query, so
#: they measure both scale and whether pruning recall survives a bigger
#: corpus; embedding_cosine_near_dup is the exact all-pairs kernel
#: (adaptive block count; the O(n^2) flop path under test).
EMB_BATTERY = [
    "embedding_norm_stats",
    "feature_scaler_params_embeddings",
    "embedding_int8_quant_error",
    "embedding_covariance_topvar",
    "label_centroid_cosine_matrix",
    "hof_zip_exists_forall_embeddings",
    "embedding_topk_cosine",
    "embedding_cosine_near_dup",
    "embedding_ann_ivf",
    "ann_recall_ivf_at5",
    "embedding_ann_ivf_kmeans",
    "ann_recall_ivf_kmeans_at5",
    "embedding_ann_signlsh",
    "ann_recall_signlsh_at5",
    # round-9 batch-29 contrastive-sampler pass (O(n·k·d) broadcast path)
    "hard_negative_mining_centroids",
    # round-9 batch-30 JL projection audit (O(n·d·k) broadcast matrix)
    "jl_projection_distortion",
    # round-9 batch-32 certified Lloyd's iterations (O(n·k·d) per pass)
    "kmeans_lloyd_certified",
    # round-9 batch-32 power iteration (one n·d² moment pass + d²-scale loop)
    "covariance_power_iteration_topdir",
]


def _read(spark: SparkSession, table: str):
    if table == "events":
        from projet5_spark.sources.readers import read_events

        return read_events(spark, BASE_SF)
    return spark.read.parquet(f"{BASE_SF}/{table}.parquet")


def synthesize(spark: SparkSession, mult: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    # shift units from the base data, shared across tables per family
    shift: dict[tuple[str, str], int] = {}
    for family, members in KEY_FAMILIES.items():
        unit = 0
        for table, col in members:
            mx = _read(spark, table).agg(F.max(col)).first()[0]
            unit = max(unit, int(mx) + 1)
        for table, col in members:
            shift[(table, col)] = unit

    replicas = F.explode(
        F.sequence(F.lit(0), F.lit(mult - 1))
    ).alias("__rep")

    #: entity-name columns must track the shifted keys they identify:
    #: names feed blocking keys (er_blocking/fs_linkage substring-block
    #: on c_name positions 10-17) and groupBy keys (q21 groups by
    #: s_name), so leaving them duplicated across replicas
    #: quadratically inflates block pair mass / merges unrelated
    #: entities — the exact wrong-workload shape the key shifts exist
    #: to avoid (measured: er_blocking 1.0 s at sf0.1 → 160 s at x100
    #: on replicated names, ~3e9 levenshtein calls over 100×-fat
    #: blocks; a suffix does NOT fix it because the block substring
    #: sits mid-name). The fixture derives these names from the key
    #: ('Customer#%09d'), so rebuilding from the shifted key gives a
    #: genuinely-bigger entity space and replica 0 reproduces the base
    #: name bit-for-bit. p_name stays as-is: it is a category-like
    #: phrase (duplicates exist in the base fixture) and token-pattern
    #: workloads (anchored regex over p_name) must keep matching.
    name_fmt = {
        "customer": ("c_name", "c_custkey", "Customer#%09d"),
        "supplier": ("s_name", "s_suppkey", "Supplier#%09d"),
    }
    for table in ("orders", "lineitem", "customer", "supplier", "part", "events"):
        df = _read(spark, table).select("*", replicas)
        for (t, col), unit in shift.items():
            if t == table:
                df = df.withColumn(
                    col, F.col(col) + F.col("__rep") * F.lit(unit)
                )
        if table in name_fmt:
            name_col, key_col, fmt = name_fmt[table]
            df = df.withColumn(
                name_col, F.format_string(fmt, F.col(key_col))
            )
        n_files = max(8, min(256, mult))
        (
            df.drop("__rep")
            .repartition(n_files)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/{table}.parquet")
        )
    for table in COPY_AS_IS:
        src = f"{BASE_SF}/{table}.parquet"
        dst = f"{out_dir}/{table}.parquet"
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)


def synthesize_docs(spark: SparkSession, mult: int, out_dir: str) -> None:
    """Scaled documents corpus (see module docstring item 3); every
    other table is symlinked from the base fixture so the full reader
    surface keeps working against ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    docs = _read(spark, "documents")
    unit = int(docs.agg(F.max("doc_id")).first()[0]) + 1
    rep = F.col("__rep")
    salted = F.concat_ws(
        " ",
        F.transform(
            F.split(F.col("text"), " "),
            lambda t: F.concat(t, F.lit("q"), rep.cast("string")),
        ),
    )
    scaled = (
        docs.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep"),
        )
        .withColumn("doc_id", F.col("doc_id") + rep * F.lit(unit))
        # replica 0 keeps the base text verbatim so base-run results
        # are literally a subset of the scaled run's
        .withColumn("text", F.when(rep == 0, F.col("text")).otherwise(salted))
        .withColumn("n_chars", F.length("text"))
        .drop("__rep")
    )
    n_files = max(8, min(64, mult))
    scaled.repartition(n_files).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    for table in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ):
        src = os.path.join(BASE_SF, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(src) and not os.path.lexists(dst):
            os.symlink(src, dst)


def synthesize_embeddings(spark: SparkSession, mult: int, out_dir: str) -> None:
    """Scaled embeddings corpus (``--emb-mult``): vec_id shift + a
    per-replica PERMUTATION of the 64 dimensions. A permutation is an
    orthogonal transform, so every intra-replica cosine/norm/dot is
    preserved EXACTLY (replica 0 keeps the identity permutation — the
    base run's pair set is literally a subset of the scaled run's),
    while cross-replica pairs behave like fresh random pairs (the same
    sim distribution the base corpus has across unrelated vectors). So
    near-dup pair mass, ANN bucket occupancy, IVF cell sizes and
    top-k candidate counts all scale the way a genuinely larger
    embedded corpus scales — naive row duplication would instead make
    every cross-replica twin an exact dup (sim 1.0) and quadratically
    inflate the τ-survivor set, a different (wrong) workload. Labels
    stay as-is: per-label/per-dim aggregates grow linearly in input,
    and the label-pair output stays fixed-size. Other tables symlink
    from the base fixture."""
    import random

    os.makedirs(out_dir, exist_ok=True)
    emb = _read(spark, "embeddings")
    unit = int(emb.agg(F.max("vec_id")).first()[0]) + 1
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    rng = random.Random(20260815)
    perms = []
    for rep in range(mult):
        p = list(range(dim))
        if rep:
            rng.shuffle(p)
        perms.append((rep, p))
    perm_df = spark.createDataFrame(perms, "__rep INT, __perm ARRAY<INT>")
    scaled = (
        emb.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("__rep"),
        )
        .join(F.broadcast(perm_df), "__rep")
        .withColumn(
            "embedding",
            F.transform(
                "__perm", lambda i: F.element_at("embedding", i + F.lit(1))
            ),
        )
        .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(unit))
        .drop("__rep", "__perm")
    )
    n_files = max(8, min(64, mult))
    scaled.repartition(n_files).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    for table in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        src = os.path.join(BASE_SF, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        if os.path.exists(src) and not os.path.lexists(dst):
            os.symlink(src, dst)


def run_battery(
    spark: SparkSession, names: list[str], sf_dir: str
) -> tuple[dict[str, float], dict[str, dict[str, int]]]:
    """Per-query wall plus per-query run-stat DELTAS (spill, shuffle) —
    the app-wide totals alone cannot attribute a spill to a query."""
    from projet5_spark.instrumentation import run_stats_summary
    from projet5_spark.operators.materialize import (
        release_persistent_rdds,
        sweep_checkpoint_scratch,
    )

    walls: dict[str, float] = {}
    deltas: dict[str, dict[str, int]] = {}
    watched = ("disk_bytes_spilled", "memory_bytes_spilled",
               "shuffle_read_bytes")
    before = run_stats_summary(spark)
    for name in names:
        # deterministic inter-query block hygiene: without it, query N
        # runs under query N-1's leftover checkpoint blocks and the
        # battery attributes pressure-induced spill to innocent queries
        # (isolated-vs-battery readings diverged by GBs; SCALING.md)
        release_persistent_rdds(spark)
        sweep_checkpoint_scratch(spark)
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # record and keep going — a scale
            # defect in one query must not hide the rest of the battery
            walls[name] = -1.0
            print(f"   ERROR  {name}: {type(exc).__name__}: "
                  f"{str(exc).splitlines()[0][:200]}", flush=True)
            before = run_stats_summary(spark)
            continue
        walls[name] = round(time.perf_counter() - t0, 2)
        after = run_stats_summary(spark)
        deltas[name] = {
            k: after.get(k, 0) - before.get(k, 0) for k in watched
        }
        before = after
        spill = deltas[name]["disk_bytes_spilled"] + deltas[name][
            "memory_bytes_spilled"
        ]
        print(
            f"{walls[name]:8.2f}  {name}"
            + (f"  [spill {spill / 1e9:.1f} GB]" if spill else ""),
            flush=True,
        )
    return walls, deltas


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=100)
    ap.add_argument("--docs-mult", type=int, default=0,
                    help="documents mode: scale the corpus instead of "
                         "the facts and run DOC_BATTERY")
    ap.add_argument("--emb-mult", type=int, default=0,
                    help="embeddings mode: scale the vector corpus "
                         "(per-replica dim permutation) and run "
                         "EMB_BATTERY")
    ap.add_argument("--keep", action="store_true", help="reuse existing dataset")
    ap.add_argument("--force-disk", action="store_true",
                    help="run even when the disk preflight predicts ENOSPC")
    ap.add_argument("--shuffle-partitions", type=int, default=None,
                    help="cluster-posture experiments: size the shuffle "
                         "width to the data instead of the local "
                         "cores default (SCALING.md round-12 facts-x200 "
                         "attribution)")
    ap.add_argument("--max-partition-bytes", default=None,
                    help="cluster-posture experiments: input split size "
                         "(e.g. 16m) — bounds per-map-task sort state")
    ap.add_argument("--base-compare", action="store_true",
                    help="also run the battery at the base sf for ratios")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    run_main(args)


#: Mean recall@5 floors the ANN variants must clear AT STRESS SCALE in
#: embeddings mode — the contract that bucket pruning still finds the
#: true neighbors when the corpus is 50-100x the fixture, not just at
#: sf0.1 (where the gates are also driver-certified for exactness).
#: Floors sit under the measured x50 values (ivf 1.0, signlsh 0.84 —
#: see SCALING.md) with headroom for LSH-seed sensitivity, and far
#: above chance (nprobe/ncells ~ 0.25). The KMeans gate carries its floor INSIDE
#: the query (kmeans_hits_ge_floor, _KMEANS_MIN_HITS) — here it must
#: simply hold true at scale.
RECALL_GATES = {
    "ann_recall_ivf_at5": 0.60,
    "ann_recall_signlsh_at5": 0.40,
}
KMEANS_GATE = "ann_recall_ivf_kmeans_at5"


def run_main(args) -> None:

    docs_mode = args.docs_mult > 0
    emb_mode = args.emb_mult > 0
    if docs_mode and emb_mode:
        raise SystemExit("--docs-mult and --emb-mult are exclusive")
    mode = "documents" if docs_mode else "embeddings" if emb_mode else "facts"
    mult = args.docs_mult if docs_mode else args.emb_mult if emb_mode else args.mult
    prefix = {"documents": "docs_x", "embeddings": "emb_x", "facts": "x"}[mode]
    out_dir = os.path.join(REPO, ".stress", f"{prefix}{mult}")
    names = args.queries or (
        DOC_BATTERY if docs_mode else EMB_BATTERY if emb_mode else DEFAULT_BATTERY
    )
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    disk_preflight(mode, mult, out_dir, getattr(args, "force_disk", False))

    spark = get_spark(
        app_name=f"scale-stress-x{mult}",
        shuffle_partitions=getattr(args, "shuffle_partitions", None),
    )
    mpb = getattr(args, "max_partition_bytes", None)
    if mpb:
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
    spark.sparkContext.setLogLevel("ERROR")
    ensure_utc(spark)

    if not (args.keep and os.path.isdir(out_dir)):
        t0 = time.perf_counter()
        if docs_mode:
            synthesize_docs(spark, mult, out_dir)
        elif emb_mode:
            synthesize_embeddings(spark, mult, out_dir)
        else:
            synthesize(spark, mult, out_dir)
        print(f"synthesized x{mult} dataset in "
              f"{time.perf_counter() - t0:.1f}s at {out_dir}", flush=True)

    base = run_battery(spark, names, BASE_SF)[0] if args.base_compare else {}
    walls, deltas = run_battery(spark, names, out_dir)

    from projet5_spark.instrumentation import run_stats_summary

    stats = run_stats_summary(spark)
    spillers = {
        n: round(
            (d["disk_bytes_spilled"] + d["memory_bytes_spilled"]) / 1e9, 1
        )
        for n, d in deltas.items()
        if d["disk_bytes_spilled"] + d["memory_bytes_spilled"] > 1e9
    }
    report = {
        "mult": mult,
        "mode": mode,
        "total_wall_sec": round(sum(walls.values()), 2),
        "queries": walls,
        "spillers_gb": spillers,
        "base_queries": base or None,
        "scaling_ratio": (
            {n: round(walls[n] / base[n], 1) for n in walls if base.get(n)}
            if base
            else None
        ),
        "failed_tasks": stats.get("num_failed_tasks"),
        "spilled_bytes": (
            stats.get("disk_bytes_spilled", 0)
            + stats.get("memory_bytes_spilled", 0)
        ),
        "shuffle_read_bytes": stats.get("shuffle_read_bytes"),
        "input_bytes": stats.get("input_bytes"),
    }
    failed_gates = []
    if mode == "embeddings":
        from pyspark.sql import functions as F

        gates = {}
        for gname, floor in RECALL_GATES.items():
            if gname not in names:
                continue
            mean_r = float(
                QUERIES[gname](spark, out_dir)
                .agg(F.avg("recall_at_5"))
                .first()[0]
            )
            gates[gname] = {
                "mean_recall_at_5": round(mean_r, 4),
                "floor": floor,
                "ok": mean_r >= floor,
            }
            if mean_r < floor:
                failed_gates.append(gname)
        if KMEANS_GATE in names:
            row = QUERIES[KMEANS_GATE](spark, out_dir).first()
            gates[KMEANS_GATE] = {
                "kmeans_hits_ge_floor": bool(row["kmeans_hits_ge_floor"]),
                "ok": bool(row["kmeans_hits_ge_floor"]),
            }
            if not row["kmeans_hits_ge_floor"]:
                failed_gates.append(KMEANS_GATE)
        report["recall_gates"] = gates
    print(json.dumps(report))
    if failed_gates:
        raise SystemExit(
            f"recall gates below floor at x{mult}: {failed_gates}"
        )


if __name__ == "__main__":
    main()
