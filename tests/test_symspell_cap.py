"""Hot-variant fan-out cap for the SymSpell deletion-neighborhood join
(VERDICT r5 task #5).

Ground truth is a brute-force all-pairs ``levenshtein <= 1`` check on a
planted corpus engineered so that one deletion variant ("hub") is
shared by 40 keys — far above the cap — and contains genuine
distance-1 pairs of every shape: exact duplicates, same-position
substitutions, and insert/delete pairs whose shorter string IS the hot
variant. Losing any hot-bucket candidate would show up as a missing
pair vs the brute-force truth.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from projet5_spark.plans.analytics14 import (
    _SYMSPELL_VARIANT_CAP,
    symspell_candidate_pairs,
)


def _planted(spark):
    # Hot bucket around the base string "hub": every name below emits
    # the variant "hub" (the base itself, single insertions at each
    # position, and exact duplicates), so the "hub" bucket holds 40
    # keys > cap=16 > the planted rare-cluster sizes.
    names = []
    k = 1
    names.append((k, "hub"))  # identity: shorter side of ins/del pairs
    base = "hub"
    for i in range(len(base) + 1):  # insertions of 'x' at each position
        for ch in "xyz":
            k += 1
            names.append((k, base[:i] + ch + base[i:]))
    # exact duplicates of one inserted form and of the base
    for _ in range(10):
        k += 1
        names.append((k, "xhub"))
    for _ in range(40 - len(names)):
        k += 1
        names.append((k, "hub"))
    assert len(names) == 40
    # rare-bucket cluster, below the cap: classic small fuzzy group
    for nm in ["alpha", "alpho", "alphas", "beta", "betb", "gamma"]:
        k += 1
        names.append((k, nm))
    return spark.createDataFrame(names, "k long, name string")


def _truth(df):
    a = df.select(F.col("k").alias("key_a"), F.col("name").alias("name_a"))
    b = df.select(F.col("k").alias("key_b"), F.col("name").alias("name_b"))
    return {
        (r.key_a, r.key_b)
        for r in a.join(b, F.col("key_a") < F.col("key_b"))
        .where(F.levenshtein("name_a", "name_b") <= 1)
        .collect()
    }


@pytest.fixture(scope="module")
def planted(spark):
    df = _planted(spark).localCheckpoint(eager=True)
    return df, _truth(df)


def test_hot_bucket_exceeds_cap(planted):
    df, _ = planted
    from projet5_spark.plans.analytics14 import _symspell_variant_rows

    nk = (
        _symspell_variant_rows(df)
        .select("k", "v")
        .distinct()
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("nk"))
        .where(F.col("v") == "hub")
        .collect()[0]
        .nk
    )
    assert nk == 40 > _SYMSPELL_VARIANT_CAP


def test_no_candidate_loss_with_hot_bucket(planted):
    df, truth = planted
    cand = {
        (r.key_a, r.key_b)
        for r in symspell_candidate_pairs(df).collect()
    }
    missing = truth - cand
    assert not missing, f"cap lost true pairs: {sorted(missing)[:10]}"


def test_exact_after_verification(planted):
    # candidates ∩ lev<=1 == truth in EVERY mode: cap=0 is the pure
    # position-exact default, cap=1 routes every shared variant hot
    # inside the split, cap=16 mixes rare and hot, a huge cap routes
    # all rare (plain variant join); all must verify to the same answer.
    df, truth = planted
    names_a = df.select(F.col("k").alias("key_a"), F.col("name").alias("name_a"))
    names_b = df.select(F.col("k").alias("key_b"), F.col("name").alias("name_b"))
    for cap in (0, 1, _SYMSPELL_VARIANT_CAP, 10_000):
        got = {
            (r.key_a, r.key_b)
            for r in symspell_candidate_pairs(df, cap=cap)
            .join(names_a, "key_a")
            .join(names_b, "key_b")
            .where(F.levenshtein("name_a", "name_b") <= 1)
            .collect()
        }
        assert got == truth, f"cap={cap} mismatch"


def test_modes_agree_on_real_fixture(spark):
    # Cross-check on actual data (sf0.001 customer names, which carry
    # dense digit-cluster buckets): after levenshtein verification the
    # position-exact default and the DF-split at the production cap
    # must produce identical pair sets — and the default's raw
    # candidate set must already BE that verified set (zero lev-2
    # false candidates), while the split's plain variant join
    # legitimately over-generates (e.g. Customer#000000010 vs
    # Customer#000000100 share a deletion variant at distance 2).
    from pyspark.sql import functions as F

    c = (
        spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
        .select(F.col("c_custkey").alias("k"), F.col("c_name").alias("name"))
    )
    na = c.select(F.col("k").alias("key_a"), F.col("name").alias("name_a"))
    nb = c.select(F.col("k").alias("key_b"), F.col("name").alias("name_b"))

    def verified(cand):
        return {
            (r.key_a, r.key_b)
            for r in cand.join(na, "key_a")
            .join(nb, "key_b")
            .where(F.levenshtein("name_a", "name_b") <= 1)
            .collect()
        }

    default_cand = {
        (r.key_a, r.key_b) for r in symspell_candidate_pairs(c).collect()
    }
    default = verified(symspell_candidate_pairs(c))
    split = verified(symspell_candidate_pairs(c, cap=_SYMSPELL_VARIANT_CAP))
    assert default == split
    assert default_cand == default  # position-exact: candidates == answer
    assert default  # the fixture genuinely contains distance<=1 pairs


def test_position_exact_candidates_are_all_true_pairs(planted):
    # The position-exact path's selling point: the candidate set IS the
    # answer — zero lev-2 false candidates, so join cost equals output
    # size. Holds for the default mode (cap=0) and for the split with
    # everything routed hot (cap=1).
    df, truth = planted
    for cap in (0, 1):
        cand = {
            (r.key_a, r.key_b)
            for r in symspell_candidate_pairs(df, cap=cap).collect()
        }
        assert cand == truth, f"cap={cap}"


def test_random_dense_corpus_all_modes(spark):
    """Seeded-random adversarial corpus: very short strings over a
    two-letter alphabet make the deletion-variant space maximally
    collision-dense (the variant "a" is shared by "aa", "ab", "ba",
    "xa", ...), with duplicate names and long insert/delete chains —
    the regime where a candidate-generation bug would actually lose
    pairs. Every cap mode must verify to the brute-force lev<=1 truth,
    and the position-exact default must emit ZERO false candidates."""
    import random

    rng = random.Random(20260814)
    names = [
        (k, "".join(rng.choice("ab") for _ in range(rng.randint(1, 4))))
        for k in range(1, 81)
    ]
    df = spark.createDataFrame(names, "k long, name string").localCheckpoint(
        eager=True
    )
    truth = _truth(df)
    assert truth, "degenerate corpus: no distance<=1 pairs planted"
    names_a = df.select(F.col("k").alias("key_a"), F.col("name").alias("name_a"))
    names_b = df.select(F.col("k").alias("key_b"), F.col("name").alias("name_b"))
    for cap in (0, 2, _SYMSPELL_VARIANT_CAP):
        cand = {
            (r.key_a, r.key_b)
            for r in symspell_candidate_pairs(df, cap=cap).collect()
        }
        verified = {
            (r.key_a, r.key_b)
            for r in symspell_candidate_pairs(df, cap=cap)
            .join(names_a, "key_a")
            .join(names_b, "key_b")
            .where(F.levenshtein("name_a", "name_b") <= 1)
            .collect()
        }
        assert verified == truth, f"cap={cap} lost or invented pairs"
        if cap == 0:
            assert cand == truth, "position-exact default over-generated"
