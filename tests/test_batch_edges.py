"""Edge-case robustness for the round-9 batteries (batches 29-33).

The oracle differential suite certifies fixture behavior; these tests
pin the DEGENERATE inputs the fixtures never exercise — fewer vectors
than clusters, a corpus with no churn events, a batch with no
duplicates, an all-identical embedding table — so a refactor that
breaks an edge contract fails CI even though every fixture row still
matches DuckDB.
"""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from projet5_spark.plans import QUERIES


def _mini_dir(spark, tmp_path, docs=None, embeddings=None, orders=None):
    """Write a minimal fixture-shaped directory with the given tables."""
    p = str(tmp_path / "sf_edge")
    if docs is not None:
        spark.createDataFrame(
            docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).write.mode("overwrite").parquet(f"{p}/documents.parquet")
    if embeddings is not None:
        spark.createDataFrame(
            embeddings, "vec_id bigint, embedding array<float>, label int"
        ).write.mode("overwrite").parquet(f"{p}/embeddings.parquet")
    if orders is not None:
        spark.createDataFrame(
            orders,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.mode("overwrite").parquet(f"{p}/orders.parquet")
    return p


def test_kmeans_with_fewer_vectors_than_k(spark, tmp_path):
    # 3 vectors, k=4: only 3 seeds exist; every cluster that forms must
    # be consistent (no crash, no phantom 4th cluster).
    embs = [(i, [float(i)] * 4, 0) for i in range(3)]
    p = _mini_dir(spark, tmp_path, embeddings=embs)
    out = QUERIES["kmeans_lloyd_certified"](spark, p).collect()
    assert 1 <= len(out) <= 3
    assert sum(r.n_members for r in out) == 3
    assert all(r.inertia >= 0 for r in out)


def test_kmeans_identical_vectors_single_cluster(spark, tmp_path):
    # All vectors identical: every distance ties at 0, the (dist, cid)
    # tie-break must send everything to the lowest seed cid with zero
    # inertia.
    embs = [(i, [1.0, 2.0, 3.0], 0) for i in range(6)]
    p = _mini_dir(spark, tmp_path, embeddings=embs)
    out = QUERIES["kmeans_lloyd_certified"](spark, p).collect()
    assert len(out) == 1 and out[0].cluster == 0
    assert out[0].n_members == 6 and out[0].inertia == 0


def test_power_iteration_zero_covariance_is_zero_vector(spark, tmp_path):
    # Identical vectors => zero covariance => w = 0 each iteration; the
    # guard denominator max(|w|)//1e6 -> 1 must not divide by zero and
    # the direction must come back all zeros.
    embs = [(i, [0.5, -0.25, 0.125], 0) for i in range(5)]
    p = _mini_dir(spark, tmp_path, embeddings=embs)
    out = QUERIES["covariance_power_iteration_topdir"](spark, p).collect()
    assert len(out) == 3
    assert all(r.dir_q == 0 for r in out)


def test_kaplan_meier_all_censored_flat_curve(spark, tmp_path):
    # Every customer orders right up to the corpus end: zero events,
    # log-survival identically 0 at every duration.
    import datetime as dt

    end = dt.datetime(2001, 8, 1)
    orders = []
    for c in range(4):
        orders.append((10 * c, c, "F", 100.0, end - dt.timedelta(days=40 * c), "1-URGENT"))
        orders.append((10 * c + 1, c, "F", 100.0, end, "1-URGENT"))
    p = _mini_dir(spark, tmp_path, orders=orders)
    out = QUERIES["kaplan_meier_customer_survival"](spark, p).collect()
    assert out, "curve must still report the risk sets"
    assert all(r.n_events == 0 for r in out)
    assert all(r.log_surv_nano == 0 for r in out)


def test_incremental_ingest_clean_batch_all_ingested(spark, tmp_path):
    # No shared shingles anywhere: the newest 20% must ingest fully.
    docs = [
        (i, " ".join(f"w{i}t{j}" for j in range(8)), "en", "s0", 40)
        for i in range(10)
    ]
    p = _mini_dir(spark, tmp_path, docs=docs)
    row = QUERIES["incremental_near_dup_ingest"](spark, p).collect()[0]
    assert row.n_new == 2  # doc_ids 8, 9
    assert row.n_dup_vs_history == 0 and row.n_dup_within_batch == 0
    assert row.n_ingested == 2


def test_span_offsets_empty_when_no_overlap(spark, tmp_path):
    # Train docs share nothing with the eval set (doc_id < 10): no spans.
    docs = [
        (i, " ".join(f"e{i}w{j}" for j in range(6)), "en", "s0", 30)
        for i in range(12)
    ]
    p = _mini_dir(spark, tmp_path, docs=docs)
    assert QUERIES["decontamination_span_offsets"](spark, p).count() == 0


def test_span_offsets_full_doc_contamination(spark, tmp_path):
    # A train doc that IS an eval doc: one span covering every token.
    eval_text = "a b c d e f"
    docs = [(0, eval_text, "en", "s0", 11), (10, eval_text, "en", "s0", 11)]
    p = _mini_dir(spark, tmp_path, docs=docs)
    rows = QUERIES["decontamination_span_offsets"](spark, p).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.doc_id == 10 and r.span_start_tok == 0
    assert r.span_end_tok == 5 and r.n_shingles == 4  # 6 tokens -> 4 shingles


def test_temperature_mixture_single_source_gets_everything(spark, tmp_path):
    docs = [(i, "x y z", "en", "only", 5) for i in range(3)]
    p = _mini_dir(spark, tmp_path, docs=docs)
    row = QUERIES["source_temperature_mixture"](spark, p).collect()[0]
    assert row.w_micro == 1_000_000
    assert row.alloc_tokens == 1_000_000


def test_quality_cap_sources_below_k_drop_nothing(spark, tmp_path):
    docs = [(i, "alpha beta gamma", "en", f"s{i % 2}", 16) for i in range(6)]
    p = _mini_dir(spark, tmp_path, docs=docs)
    out = QUERIES["source_quality_cap_topk"](spark, p).collect()
    assert all(r.n_kept == r.n_docs and r.dropped_tokens == 0 for r in out)


def test_threshold_curve_exact_dup_hits_top_bucket(spark, tmp_path):
    docs = [
        (0, "p q r s t u", "en", "s0", 11),
        (1, "p q r s t u", "en", "s0", 11),
        (2, "z1 z2 z3 z4 z5 z6", "en", "s0", 17),
    ]
    p = _mini_dir(spark, tmp_path, docs=docs)
    rows = QUERIES["near_dup_threshold_curve"](spark, p).collect()
    assert len(rows) == 1
    # J = 1.0 exactly: floor(1.0 * 20) / 20 puts exact dups in their
    # own top bucket, above the [0.95, 1.0) band
    assert rows[0].bucket == pytest.approx(1.0)
    assert rows[0].n_pairs == 1 and rows[0].max_jaccard == 1.0


def test_threshold_curve_certifies_above_sampling_bound(spark, tmp_path):
    # ADVICE r10 (medium): with the old xxhash64 digest slice, the
    # DuckDB oracle could not replay sampling, so above _CURVE_MAX_DOCS
    # the entry mismatched BY CONSTRUCTION. The sha-256 slice + the
    # count-conditional oracle predicate must make the pair certify on
    # the sampled side of the bound too — this runs the real query and
    # the registered oracle SQL side-by-side on a 20.1k-doc corpus.
    import duckdb

    from projet5_spark.plans import ORACLE
    from projet5_spark.plans.analytics29 import _CURVE_MAX_DOCS

    n = _CURVE_MAX_DOCS + 100
    keep = [
        i
        for i in range(n)
        if hashlib.sha256(f"curve:{i}".encode()).hexdigest()[0] == "0"
    ]
    assert len(keep) > 100  # the slice is ~1/16 of the corpus
    dup_a, dup_b = keep[0], keep[1]  # planted near-dup pair INSIDE the slice
    rows = []
    for i in range(n):
        text = (
            "dup alpha beta gamma delta"
            if i in (dup_a, dup_b)
            else f"t{i}a t{i}b t{i}c t{i}d"
        )
        rows.append((i, text, "en", "s0", len(text)))
    p = _mini_dir(spark, tmp_path, docs=rows)

    got = {
        (r.bucket, r.n_pairs, r.min_jaccard, r.max_jaccard)
        for r in QUERIES["near_dup_threshold_curve"](spark, p).collect()
    }
    con = duckdb.connect()
    con.execute(
        # the mini fixture is a Spark-written directory, not the
        # driver's single-file layout — glob its parts
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{p}/documents.parquet/*.parquet')"
    )
    want = {
        tuple(r)
        for r in con.execute(ORACLE["near_dup_threshold_curve"]).fetchall()
    }
    assert got == want
    # and the curve is non-trivial: the planted exact-dup pair survived
    # the slice and lands in the J=1.0 bucket on both engines
    assert any(b == 1.0 and np == 1 for b, np, _, _ in got)


def test_simhash_sha_lane_overflow_raises_in_plan(spark, tmp_path):
    # The packed 16-bit vote lanes are only carry-free below 2^16
    # distinct shingles per doc; a violating doc must raise LOUDLY
    # (ADVICE r10), never silently corrupt adjacent bit counters. Two
    # acceptable loud paths: ANSI long-overflow inside the vote
    # aggregate (a top-lane pile-up, which this uniform input hits), or
    # the in-plan raise_error n-guard (low-lane-only carries). 65538
    # distinct tokens => exactly 65536 distinct 3-gram shingles == the
    # first violating count.
    text = " ".join(f"t{i}" for i in range(65538))
    docs = [(0, text, "en", "s0", len(text))]
    p = _mini_dir(spark, tmp_path, docs=docs)
    with pytest.raises(
        Exception, match="vote lanes overflow|ARITHMETIC_OVERFLOW"
    ):
        QUERIES["simhash_sha_near_dup"](spark, p).write.format("noop").mode(
            "overwrite"
        ).save()


def test_curve_corpus_sampling_guard_switches_above_bound(spark, tmp_path):
    # The calibration-sampling posture is enforced in code: at or below
    # the bound the corpus passes through untouched; above it the curve
    # runs on a deterministic digest slice (content-addressed, so two
    # invocations agree row-for-row).
    from projet5_spark.plans.analytics29 import curve_corpus

    docs = [(i, f"tok{i} a b c d", "en", "s0", 12) for i in range(40)]
    p = _mini_dir(spark, tmp_path, docs=docs)
    df = spark.read.parquet(f"{p}/documents.parquet")

    same, sampled = curve_corpus(df, max_docs=40)
    assert not sampled and same is df

    sliced, sampled = curve_corpus(df, max_docs=10)
    assert sampled
    ids1 = sorted(r.doc_id for r in sliced.select("doc_id").collect())
    sliced2, _ = curve_corpus(df, max_docs=10)
    ids2 = sorted(r.doc_id for r in sliced2.select("doc_id").collect())
    assert ids1 == ids2  # deterministic digest slice, not an RNG sample
    assert 0 < len(ids1) < 40  # a real cut, not all-or-nothing
    # ENGINE-REPLAYABLE: the slice is plain sha-256 over 'curve:<id>',
    # so any engine (here: hashlib standing in for the DuckDB oracle's
    # sha256()) derives the identical keep-set — the property that lets
    # near_dup_threshold_curve certify above the sampling bound
    expected = [
        i
        for i in range(40)
        if hashlib.sha256(f"curve:{i}".encode()).hexdigest()[0] == "0"
    ]
    assert ids1 == expected


# ---------------------------------------------------------------------------
# Scale-gated big-path equivalence: the >=150k-doc branches (scratch-
# parquet materialization, widened near-unique-key aggregates, pinned
# shuffled-hash builds, mass-scaled verify partitioning) are exercised
# by the stress batteries, not the fixtures. Forcing the pivot to 0
# runs the SAME fixture corpus down the big path and pins bit-for-bit
# output equality — blocking/width/materialization choices must only
# ever change the physical plan.
# ---------------------------------------------------------------------------

_GATED_QUERIES = [
    "ppjoin_prefix_filter_pairs",
    "ngram_novelty_decay",
    "simhash_sha_near_dup",
    "winnowing_fingerprints",
    "winnowing_near_dup_pairs",
    "decontamination_span_offsets",
    "shingle_containment_pairs",
    "tfidf_cosine_pairs_topk",
    "simhash_near_dup",
]


def _rows_key(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", _GATED_QUERIES)
def test_big_path_equals_small_path(spark, name, monkeypatch):
    import projet5_spark.plans.llm as llm

    sf = "/root/testdata/sf0.001"
    small = _rows_key(QUERIES[name](spark, sf))
    monkeypatch.setattr(llm, "_ATTACH_SHJ_MIN_DOCS", 0)
    big = _rows_key(QUERIES[name](spark, sf))
    assert big == small
    assert len(big) > 0


def test_small_lc_materialize_equals_lazy(spark, monkeypatch):
    """The r12 small-corpus localCheckpoint pivot in ngram_near_dup_pairs
    (_LC_MATERIALIZE_MAX_DOCS) must be a pure physical-plan change:
    force the ceiling to -1 so the lazy (exchange-reuse) form runs at
    fixture scale and compare the pair sets."""
    import projet5_spark.plans.llm as llm

    sf = "/root/testdata/sf0.001"
    checkpointed = _rows_key(QUERIES["ngram_jaccard_near_dup"](spark, sf))
    monkeypatch.setattr(llm, "_LC_MATERIALIZE_MAX_DOCS", -1)
    lazy = _rows_key(QUERIES["ngram_jaccard_near_dup"](spark, sf))
    assert checkpointed == lazy
    assert len(checkpointed) > 0


def test_minhash_bounded_verify_equals_default(spark, monkeypatch):
    """The mass-scaled verify repartition (the x200 OOM fix) must be a
    pure physical-plan change: force the bound to 0 so the explicit
    build partitioning engages at fixture scale and compare pair sets."""
    import projet5_spark.plans.llm as llm

    sf = "/root/testdata/sf0.001"
    default = _rows_key(QUERIES["minhash_lsh_near_dup"](spark, sf))
    monkeypatch.setattr(llm, "_VERIFY_BOUND_MIN_ROWS", 0)
    bounded = _rows_key(QUERIES["minhash_lsh_near_dup"](spark, sf))
    assert bounded == default
    assert len(bounded) > 0


def test_winnowing_near_dup_guarantee_planted(spark, tmp_path):
    """Winnowing's guarantee: any shared run of >= w + k - 1 (= 8)
    tokens yields a shared fingerprint, so a planted quotation-length
    overlap MUST surface as a pair even though the docs are globally
    dissimilar; token-disjoint docs must never pair."""
    import pandas as pd

    shared_run = [f"q{i}" for i in range(16)]  # 16-token shared quote
    doc1 = [f"a{i}" for i in range(40)] + shared_run + [f"b{i}" for i in range(40)]
    doc2 = [f"c{i}" for i in range(40)] + shared_run + [f"d{i}" for i in range(40)]
    doc3 = [f"e{i}" for i in range(60)]  # token-disjoint
    rows = [
        {"doc_id": i, "text": " ".join(t), "lang": "en", "source": "planted",
         "n_chars": len(" ".join(t))}
        for i, t in [(1, doc1), (2, doc2), (3, doc3)]
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r
        for r in QUERIES["winnowing_near_dup_pairs"](spark, str(tmp_path)).collect()
    }
    assert (1, 2) in got, got
    assert all(3 not in k for k in got)
    r = got[(1, 2)]
    assert r["n_shared"] >= 2
    assert 0 < r["overlap_micro"] <= 1_000_000


def test_multi_signal_fusion_complementarity_planted(spark, tmp_path):
    """The fusion's reason to exist, planted: a quotation-length copy
    inside globally-dissimilar docs is winnowing-ONLY (n_signals = 1 —
    Jaccard dilutes it, SimHash signatures are far), a one-token edit
    of a doc fires multiple detectors, a token-disjoint doc pairs with
    nothing; the verdict keeps exactly one doc per cluster and the
    agreement rollup partitions the matrix."""
    import pandas as pd

    shared_run = [f"q{i}" for i in range(16)]
    doc1 = [f"a{i}" for i in range(40)] + shared_run + [f"b{i}" for i in range(40)]
    doc2 = [f"c{i}" for i in range(40)] + shared_run + [f"d{i}" for i in range(40)]
    doc3 = [f"e{i}" for i in range(60)]  # token-disjoint
    base = [f"z{i}" for i in range(60)]
    doc4, doc5 = base, base[:-1] + ["yy"]  # one-token edit
    rows = [
        {"doc_id": i, "text": " ".join(t), "lang": "en", "source": "planted",
         "n_chars": len(" ".join(t))}
        for i, t in [(1, doc1), (2, doc2), (3, doc3), (4, doc4), (5, doc5)]
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    p = str(tmp_path)

    m = {
        (r["doc_a"], r["doc_b"]): r
        for r in QUERIES["near_dup_signal_matrix"](spark, p).collect()
    }
    assert (1, 2) in m and (4, 5) in m
    assert all(3 not in k for k in m)
    r12 = m[(1, 2)]
    assert r12["overlap_micro"] is not None
    assert r12["jaccard"] is None and r12["hamming"] is None
    assert r12["n_signals"] == 1
    r45 = m[(4, 5)]
    assert r45["jaccard"] is not None and r45["jaccard"] >= 0.5
    assert r45["n_signals"] >= 2

    v = {r["doc_id"]: r for r in
         QUERIES["multi_signal_dedup_verdict"](spark, p).collect()}
    assert set(v) == {1, 2, 4, 5}  # doc3 never clusters
    assert sum(v[d]["keep"] for d in (1, 2)) == 1
    assert sum(v[d]["keep"] for d in (4, 5)) == 1
    assert v[1]["cluster_size"] == 2 and v[4]["cluster_rep"] == 4

    agg = QUERIES["near_dup_signal_agreement"](spark, p).collect()
    assert sum(r["n_pairs"] for r in agg) == len(m)
