"""grouped_exact_quantiles must be bit-identical to F.percentile.

The operator exists to replace per-group value buffering
(ObjectHashAggregate) with a domain-bounded cumulative window — the
results must not move by a single ULP, because oracle-paired queries
floor them onto output grids where any drift becomes a hash mismatch.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from projet5_spark.operators.quantiles import grouped_exact_quantiles

QS = {"q00": 0.0, "q05": 0.05, "q25": 0.25, "q50": 0.5, "q75": 0.75,
      "q90": 0.9, "q99": 0.99, "q100": 1.0}


def _percentile_twin(df, keys, value):
    aggs = [
        F.percentile(value, F.lit(q)).alias(name) for name, q in QS.items()
    ]
    return df.groupBy(*keys).agg(*aggs)


def _assert_equal(spark, df, keys, value):
    got = {
        tuple(r[k] for k in keys): [r[n] for n in QS]
        for r in grouped_exact_quantiles(df, keys, value, QS).collect()
    }
    want = {
        tuple(r[k] for k in keys): [r[n] for n in QS]
        for r in _percentile_twin(df, keys, value).collect()
    }
    assert got == want  # bit-exact, not approx


def test_matches_percentile_grouped_longs_with_ties(spark):
    rng = random.Random(7)
    rows = [
        (g, rng.choice([0, 1, 5, 5, 5, 7, 100, 10_000, -3]))
        for g in "abc"
        for _ in range(rng.randint(1, 400))
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    _assert_equal(spark, df, ["g"], "v")


def test_matches_percentile_doubles_and_singletons(spark):
    rng = random.Random(11)
    rows = [("one", 42.5)] + [
        ("many", rng.uniform(-1e6, 1e6)) for _ in range(997)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    _assert_equal(spark, df, ["g"], "v")


def test_matches_percentile_global_and_ignores_nulls(spark):
    rng = random.Random(13)
    rows = [(rng.randint(-50, 50),) for _ in range(500)] + [(None,)] * 25
    df = spark.createDataFrame(rows, "v int")
    _assert_equal(spark, df, [], "v")


def test_disc_matches_percentile_disc(spark):
    rng = random.Random(17)
    rows = [
        (g, rng.choice([1, 2, 2, 3, 50, 51]))
        for g in "ab"
        for _ in range(rng.randint(2, 99))
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    dq = {"d05": 0.05, "d50": 0.5, "d95": 0.95, "d0": 0.0, "d1": 1.0}
    got = {
        r["g"]: [r[n] for n in dq]
        for r in grouped_exact_quantiles(df, ["g"], "v", {}, disc_qs=dq).collect()
    }
    twin = df.groupBy("g").agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY v)").alias(n)
            for n, q in dq.items()
        ]
    )
    want = {r["g"]: [r[n] for n in dq] for r in twin.collect()}
    assert got == want


def test_two_element_interpolation_exact(spark):
    # pos lands strictly between the two ranks for every interior q
    df = spark.createDataFrame([(10,), (20,)], "v long")
    row = grouped_exact_quantiles(df, [], "v", QS).head()
    assert row["q00"] == 10.0 and row["q100"] == 20.0
    assert row["q50"] == pytest.approx(15.0, abs=0)
    _assert_equal(spark, df, [], "v")
