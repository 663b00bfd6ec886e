"""Partition-sizing helpers.

The engine's window/sort-heavy plans must size their shuffle
parallelism to the DATA, not to a fixed config: a window over a fact
table shuffles into ``spark.sql.shuffle.partitions`` task partitions,
and each task then sorts its whole slice — at x100 stress that is
~1.9M rows (~76 MB) per task, just past the per-task execution-memory
share (heap * 0.6 / 32 concurrent tasks), so every task spills a
little and the battery reports gigabytes of sort spill. Sizing the
pre-window repartition so each task sorts ~a memory-share of bytes
removes the spill entirely without changing the plan shape; on a real
cluster the same arithmetic holds per executor core.

AQE cannot do this for us: adaptive coalescing only SHRINKS partition
counts toward ``advisoryPartitionSizeInBytes``; it never splits a
non-skewed-but-uniformly-oversized sort input.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

from pyspark.sql import DataFrame


def input_size_bytes(df: DataFrame) -> int | None:
    """Total on-disk size of the DataFrame's input files — metadata
    only, no job. Returns None when any file is not local/statable
    (object stores, streaming sources): callers fall back to config."""
    total = 0
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("file", ""):
            return None
        try:
            total += os.path.getsize(p.path)
        except OSError:
            return None
    return total


def sized_sort_parallelism(
    df: DataFrame,
    *,
    bytes_per_task: int = 8 << 20,
    cap: int = 4096,
) -> int:
    """Partition count for a pre-sort repartition such that each task
    sorts roughly ``bytes_per_task`` of COMPRESSED input (the in-memory
    sort row is larger — UnsafeRow headers, decompression — so the
    default 8 MB of parquet ≈ tens of MB sorted, comfortably inside a
    per-task execution-memory share even at 32 concurrent tasks on an
    8g heap). Never returns fewer than ``spark.sql.shuffle.partitions``
    (a query that was fine at the default stays unchanged — fixture
    benches keep their plans) and never more than ``cap`` (scheduler
    sanity; at genuinely larger scale raise the config instead)."""
    spark = df.sparkSession
    try:
        floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        floor = spark.sparkContext.defaultParallelism
    size = input_size_bytes(df)
    if size is None:
        return floor
    return max(floor, min(cap, (size + bytes_per_task - 1) // bytes_per_task))
