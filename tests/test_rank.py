"""Distributed global rank / ntile (operators/rank.py) vs the native
single-partition window — exact equality on random data, adversarial
tie patterns, and the n < tiles edge."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from projet5_spark.operators.rank import global_row_numbers, with_global_ntile


def _random_rows(seed: int, n: int):
    rng = random.Random(seed)
    # heavy value ties (domain << n) so range boundaries land on ties;
    # the id column makes the order total
    return [(i, rng.randint(0, max(1, n // 8))) for i in range(n)]


def test_global_row_numbers_matches_native_window(spark):
    # descending axis via key negation, heavy ties on the key
    df = spark.createDataFrame(_random_rows(7, 503), ["id", "v"])
    got = global_row_numbers(df, -F.col("v"), [F.asc("id")], n_parts=7)
    native = df.select(
        "id",
        F.row_number()
        .over(Window.orderBy(F.desc("v"), F.asc("id")))
        .alias("rn"),
    )
    joined = got.select("id", "__rn", "__n").join(native, "id")
    assert joined.where(F.col("__rn") != F.col("rn")).count() == 0
    assert joined.select("__n").distinct().collect()[0][0] == 503


def test_global_ntile_matches_native_all_remainders(spark):
    # n mod t sweeps 0..t-1 so both tiling branches and the uneven
    # first-tiles rule are all exercised
    for n in (40, 41, 43, 44):
        df = spark.createDataFrame(_random_rows(n, n), ["id", "v"])
        got = with_global_ntile(df, 4, F.col("v"), [F.asc("id")], "tile")
        native = df.select(
            "id",
            F.ntile(4)
            .over(Window.orderBy(F.asc("v"), F.asc("id")))
            .alias("nt"),
        )
        bad = (
            got.select("id", "tile")
            .join(native, "id")
            .where(F.col("tile") != F.col("nt"))
            .count()
        )
        assert bad == 0, f"n={n}"


def test_global_ntile_fewer_rows_than_tiles(spark):
    df = spark.createDataFrame([(1, 9), (2, 3)], ["id", "v"])
    got = {
        r["id"]: r["tile"]
        for r in with_global_ntile(
            df, 5, F.col("v"), [F.asc("id")], "tile"
        ).collect()
    }
    # rank i of n<t rows lands alone in tile i
    assert got == {2: 1, 1: 2}


def test_global_row_numbers_single_value_key(spark):
    # all rows share one key value: every split point collapses, the
    # single bucket path must still produce a correct total order
    df = spark.createDataFrame([(i, 42) for i in range(30)], ["id", "v"])
    got = global_row_numbers(df, F.col("v"), [F.asc("id")], n_parts=8)
    rows = {r["id"]: r["__rn"] for r in got.collect()}
    assert rows == {i: i + 1 for i in range(30)}


def test_rfm_distributed_arm_matches_native(spark, monkeypatch):
    """Force rfm_segmentation over the with_global_ntile arm and pin it
    against the native-window arm the fixtures normally take."""
    import projet5_spark.plans.analytics6 as a6

    sf = "/root/testdata/sf0.001"
    native = a6.rfm_segmentation(spark, sf).collect()
    monkeypatch.setattr(a6, "_NTILE_DISTRIBUTED_MIN", 0)
    dist = a6.rfm_segmentation(spark, sf).collect()
    key = lambda r: (r["r_score"], r["f_score"], r["m_score"])  # noqa: E731
    assert sorted(map(tuple, native)) == sorted(map(tuple, dist))
    assert len({key(r) for r in native}) == len(native)
