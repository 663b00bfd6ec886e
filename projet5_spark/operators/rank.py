"""Distributed total-order ranking: exact global ``row_number`` /
``ntile`` without a single-partition window.

Spark executes an unpartitioned ``Window.orderBy(...)`` by funneling
EVERY row through one task — the classic fact-scale serialization (the
x100 stress battery measured 85.8 s for one such rank over 15M
orders). The two-phase scheme here keeps the exact semantics while
staying parallel at any scale:

1. at plan-build time, take ~``spark.sql.shuffle.partitions``
   approximate split points of the ascending sort key
   (``percentile_approx``) and bake them into the plan as LITERALS —
   the bucket id is then a pure deterministic function of the key.
   (A ``repartitionByRange``-based variant was rejected: its sampled
   boundaries are not stable across the two subtree evaluations below,
   so ``spark_partition_id`` could disagree between them — observed as
   a wrong-tile bug at sf0.1.)
2. per-bucket row counts → cumulative offsets (a buckets-scale
   relation, broadcast back);
3. ``row_number`` WITHIN each bucket (parallel, one hash shuffle on
   the bucket id) plus the bucket's offset = the exact global rank.

Approximate split points only affect bucket BALANCE, never
correctness: every row lands in exactly one bucket, buckets are
contiguous in key order, and ties on the key share a bucket.

``ntile`` then follows from the rank and the total count by the
standard SQL tiling rule (first ``n mod t`` tiles get one extra row),
evaluated as a closed-form expression — identical to the native
``ntile`` both Spark and DuckDB implement.

The full order (key, then tie-breaks) MUST be total — every caller in
this repo already uses total orders for engine-parity reasons
(BASELINE.md §6.1). Descending axes negate the key (pass ``-col``),
mirroring how the repo's other two-phase rank picks do it.

Cost note: the input is referenced by the counts arm and the
row_number arm (plus the one split-point aggregate at build time), so
it is evaluated up to thrice — checkpoint an expensive upstream first
(SCALING.md shared-subtree policy). Both callers in the plans do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _n_buckets(df: DataFrame) -> int:
    spark = df.sparkSession
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # e.g. conf set to "auto" under AQE
        return spark.sparkContext.defaultParallelism


def global_row_numbers(
    df: DataFrame,
    key: Column,
    tiebreaks: list[Column | str],
    rn_col: str = "__rn",
    n_col: str = "__n",
    n_parts: int | None = None,
) -> DataFrame:
    """Add the exact 1-based global ``row_number`` under the TOTAL
    ascending order ``(key, *tiebreaks)`` as ``rn_col``, and the total
    row count as ``n_col``, without a global sort. ``key`` must be a
    numeric expression over ``df``'s columns; building the plan runs
    one small aggregate job (the repo's documented eager-build
    pattern)."""
    b = n_parts or _n_buckets(df)
    d = df.withColumn("__key", key)
    qs = [i / b for i in range(1, b)]
    spl = d.agg(F.percentile_approx("__key", qs, 100).alias("s")).first()["s"]
    bounds = sorted({v for v in (spl or []) if v is not None})
    # rows equal to a split point land below it — any consistent rule
    # works, buckets just need to be contiguous in key order. A plain
    # CASE chain, not a higher-order filter over a literal array: an
    # HOF lambda capturing the key column trips a Catalyst
    # column-pruning internal error (ATTRIBUTE_NOT_FOUND) when only
    # derived columns are selected downstream.
    bucket = F.lit(len(bounds))
    for i, v in enumerate(reversed(bounds)):
        bucket = F.when(
            F.col("__key") <= F.lit(v), F.lit(len(bounds) - 1 - i)
        ).otherwise(bucket)
    d = d.withColumn("__bkt", bucket)
    counts = d.groupBy("__bkt").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    wb = Window.orderBy("__bkt")  # buckets-scale rows only: tiny by design
    offs = counts.select(
        "__bkt",
        (F.sum("__c").over(wb) - F.col("__c")).alias("__off"),
        F.sum("__c").over(Window.partitionBy()).alias(n_col),
    )
    win = Window.partitionBy("__bkt").orderBy(F.asc("__key"), *tiebreaks)
    return (
        d.join(F.broadcast(offs), "__bkt")
        .withColumn(rn_col, F.col("__off") + F.row_number().over(win))
        .drop("__bkt", "__off", "__key")
    )


def with_global_ntile(
    df: DataFrame,
    n_tiles: int,
    key: Column,
    tiebreaks: list[Column | str],
    out_col: str,
) -> DataFrame:
    """Add ``ntile(n_tiles) OVER (ORDER BY key, *tiebreaks)`` as
    ``out_col`` (long), computed distributed via
    :func:`global_row_numbers`.

    Tiling rule (standard SQL, matching Spark's and DuckDB's native
    ntile): with ``q = n div t`` and ``r = n mod t``, the first ``r``
    tiles hold ``q+1`` rows and the rest hold ``q``; a rank in the
    first ``r*(q+1)`` rows lands in tile ``ceil(rn/(q+1))``, any later
    rank in tile ``r + ceil((rn - r*(q+1))/q)``. When ``n < t`` the
    second branch is unreachable (``r*(q+1) = n``), so its ``div 0``
    never evaluates on a real row."""
    t = int(n_tiles)
    d = global_row_numbers(df, key, tiebreaks)
    tile = F.expr(
        f"CASE WHEN __rn <= (__n % {t}) * ((__n div {t}) + 1) "
        f"THEN (__rn + (__n div {t})) div ((__n div {t}) + 1) "
        f"ELSE (__n % {t}) + "
        f"((__rn - (__n % {t}) * ((__n div {t}) + 1)) + (__n div {t}) - 1) "
        f"div (__n div {t}) END"
    )
    return d.withColumn(out_col, tile.cast("long")).drop("__rn", "__n")
