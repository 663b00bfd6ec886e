"""Parquet-backed materialization — the cluster-sane checkpoint.

``DataFrame.localCheckpoint`` / ``persist`` route the producing plan
through the block-cache build path, which executes measurably worse
than the same plan under a plain action: at x20 docs the near-dup
pair pipeline runs spill-free to a noop sink or ``count()`` but
spills 2.2 GB into its aggregates the moment its result is block-
cached (measured round 10; the regression tracks the cache-build
execution path, not the data size — the cached edge list itself is
5 120 rows). A parquet round-trip materializes through the ordinary
write path instead: full AQE, no storage-memory coupling, lineage
truncated by the scan — and it is exactly what checkpointing looks
like on a real cluster (durable storage, survives executor loss,
readable by later stages at scan speed). localCheckpoint remains the
right tool for SMALL frames with cheap upstreams (entity-scale side
tables, per-round loop labels), where the block write is trivial and
the round-trip latency would dominate.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid
from typing import Callable

from pyspark.sql import DataFrame

_ROOTS: dict[str, str] = {}

# Scratch paths handed out and not yet release()'d / swept. Unreleased
# entries at sweep time are usually the DESIGNED case (queries that
# return a lazy DataFrame over a checkpoint release via the sweep),
# but the registry lets the sweep name what it reclaims, so a
# FileNotFound at a later action time is diagnosable from the log
# instead of a mystery.
_OUTSTANDING: set[str] = set()


def _scratch_root(app_id: str) -> str:
    root = _ROOTS.get(app_id)
    if root is None or not os.path.isdir(root):
        root = os.path.join(
            tempfile.gettempdir(), f"projet5-ckpt-{app_id}"
        )
        os.makedirs(root, exist_ok=True)
        _ROOTS[app_id] = root
        atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def parquet_checkpoint(
    df: DataFrame, label: str = "ckpt"
) -> tuple[DataFrame, Callable[[], None]]:
    """Materialize ``df`` to scratch parquet and return
    ``(reread_df, release)`` — ``release()`` deletes the files once
    every consumer is done (safe to call more than once; best-effort).

    The write is a plain DataFrame action (AQE on, no block cache);
    the re-read is a fresh parquet scan, so downstream plans start
    from a constant-size leaf — the lineage-truncation property loops
    like connected-components rely on. On a cluster the scratch root
    would be a durable checkpoint dir; locally it lives under the
    system temp dir and is removed at exit.

    Parquet round-trips every type the engine materializes (longs,
    doubles, strings, arrays, structs, timestamps) bit-exactly; a
    frame with an untyped all-NULL column (VOID type) is the one
    shape parquet cannot hold — cast such columns first.
    """
    spark = df.sparkSession
    root = _scratch_root(spark.sparkContext.applicationId)
    path = os.path.join(root, f"{label}-{uuid.uuid4().hex[:12]}")
    df.write.mode("overwrite").parquet(path)
    _OUTSTANDING.add(path)

    def release() -> None:
        shutil.rmtree(path, ignore_errors=True)
        _OUTSTANDING.discard(path)

    return spark.read.parquet(path), release


def scratch_dir(spark, prefix: str) -> str:
    """A fresh directory under the app's atexit-cleaned scratch root —
    for throwaway on-disk state a query returns a lazy reader over
    (e.g. the statestore-audit streaming checkpoint). Living under the
    root means the inter-query :func:`sweep_checkpoint_scratch` and the
    atexit hook both reclaim it; the caller never deletes it inline
    because the consuming action runs later, in the caller's caller."""
    root = _scratch_root(spark.sparkContext.applicationId)
    path = os.path.join(root, f"{prefix}-{uuid.uuid4().hex[:12]}")
    os.makedirs(path, exist_ok=True)
    _OUTSTANDING.add(path)
    return path


def sweep_checkpoint_scratch(spark) -> int:
    """Delete every parquet checkpoint under the app's scratch root
    NOW; returns the count of directories removed. Inter-query hygiene
    companion to :func:`release_persistent_rdds`: a query that returns
    a lazy DataFrame over a checkpoint (minhash_lsh_near_dup's hashed
    shingle relation) cannot release it in-function — the consuming
    action runs later, in the caller — so bench/battery loops that
    re-invoke such queries accumulate one full scratch copy per run
    until process exit (multi-GB at x100 docs). Between queries every
    checkpoint is dead weight (queries rebuild their frames per
    invocation), so the sweep is safe exactly where the RDD sweep is;
    never call it while a returned-but-unconsumed DataFrame is live.

    Only directories that actually disappeared count toward the
    return value (an rmtree that fails — e.g. a file pinned open —
    leaves the dir and is not "removed"). Reclaimed paths that were
    handed out by :func:`parquet_checkpoint` / :func:`scratch_dir`
    and never released are logged at INFO, so if a caller violates
    the not-while-live rule the later FileNotFound is traceable to a
    named sweep instead of surfacing as a bare missing path."""
    root = _ROOTS.get(spark.sparkContext.applicationId)
    if root is None or not os.path.isdir(root):
        return 0
    n = 0
    reclaimed_outstanding = []
    for entry in os.listdir(root):
        path = os.path.join(root, entry)
        shutil.rmtree(path, ignore_errors=True)
        if os.path.isdir(path):
            continue  # rmtree failed; dir still there — not removed
        n += 1
        if path in _OUTSTANDING:
            _OUTSTANDING.discard(path)
            reclaimed_outstanding.append(path)
    if reclaimed_outstanding:
        import logging

        logging.getLogger(__name__).info(
            "sweep_checkpoint_scratch reclaimed %d unreleased scratch "
            "dir(s): %s — any later action over a DataFrame built on "
            "these will fail; by contract none should be live here",
            len(reclaimed_outstanding),
            ", ".join(sorted(reclaimed_outstanding)),
        )
    return n


def release_persistent_rdds(spark) -> int:
    """Unpersist every block-cached RDD of the session NOW; returns the
    count released. Inter-query hygiene for battery/bench loops:
    ``localCheckpoint`` blocks outlive their query until the
    ContextCleaner's GC-driven sweep gets to them, so in back-to-back
    runs query N executes under query N-1's leftover storage pressure
    — x20-docs batteries attributed multi-GB spill to queries that run
    spill-free isolated (SCALING.md "lingering blocks"). Queries are
    contractually independent (each invocation rebuilds its frames),
    so between queries every retained block is dead weight; on a real
    cluster each query would be its own application and this sweep is
    implicit. Never call it mid-query: a checkpointed frame's blocks
    ARE its data until the consuming action finishes."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    for rdd in jmap.values():
        try:
            rdd.unpersist(False)
            n += 1
        except Exception:  # racing with the cleaner is fine
            pass
    return n
