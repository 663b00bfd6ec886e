"""Profiling operators (reference R3-R6, R18).

The reference profiles with four pandas calls (migration.py:135-139):
``len``, ``dtypes``, ``isna().sum()``, ``duplicated().sum()``. Here each
profile is **one aggregate job** — a single scan producing every
per-column statistic at once, instead of a pass per statistic. At 100 TB
a profile that re-scans per column is O(cols) full reads; this is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def null_profile(df: DataFrame) -> DataFrame:
    """R5: missing values per column — one row, one aggregate job
    (migration.py:138 ``df.isna().sum()``)."""
    return df.select(
        [F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    )


def duplicate_count(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """R6: count of all-but-first-occurrence duplicate rows
    (migration.py:139 ``df.duplicated().sum()``).

    Set-based: group on the row identity, Σ(count-1) over groups seen
    more than once. Partial aggregation makes the shuffle carry only
    distinct keys — no full-row sort, no windowing.
    """
    cols = subset or df.columns
    return (
        df.groupBy(*cols)
        .count()
        .where(F.col("count") > 1)
        .agg(F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("dup_rows"))
    )


def table_stats(df: DataFrame) -> DataFrame:
    """R3/R4/R5 combined: row count + per-column null counts in one job.
    Dtypes are plan metadata (``df.dtypes``) — free, no job — so they are
    not recomputed here."""
    aggs = [F.count(F.lit(1)).alias("row_count")] + [
        F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in df.columns
    ]
    return df.agg(*aggs)
