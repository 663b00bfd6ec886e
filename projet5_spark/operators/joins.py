"""Join operators beyond plain ``df.join``.

The reference's only joins are the implicit FK attach (R12,
migration.py:236 — per-row dict lookup) and the existence anti-check
(R14 — per-row ``find_one``). Both are plain ``df.join`` here (broadcast
and left_anti respectively). This module adds the helpers Spark lacks as
named operators: explicit broadcast, and a scalable **as-of join**.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """R12: FK attach — equi-join fact→dim with the dim side broadcast.

    The fact side never shuffles: each task hash-probes a replicated dim
    map. At 100 TB this is the only sane plan for dim tables under the
    broadcast threshold; for larger dims drop the hint and let AQE pick
    (sort-merge, or runtime-convert back to broadcast if the dim's
    post-filter size shrinks under the threshold).
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-mitigated equi-join: salt the fact side's key with a random
    shard in [0, salt), replicate the dim side across all shards, join
    on (key, shard).

    When one key holds a disproportionate share of the fact rows, a
    plain shuffle sends that whole key to one reducer; salting spreads
    it over ``salt`` reducers at the cost of replicating the (small)
    dim ``salt``×. AQE's skew-join splitting covers many cases
    automatically — this is the explicit tool for when it can't (e.g.
    aggregation-after-join keyed on the same skewed column).

    Only ``inner`` and ``left`` are supported: the dim side is
    replicated ``salt``×, so right/full-outer variants would emit every
    unmatched dim row once per shard — silent duplicates.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: the "
            f"salt-replicated dim side would duplicate unmatched rows "
            f"in outer variants"
        )
    salted_fact = fact.withColumn(
        "__shard", (F.rand(seed=42) * salt).cast("int")
    )
    shards = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(salt).select(F.col("id").cast("int").alias("__shard"))
        )
    )
    out = salted_fact.join(shards, on=[on, "__shard"], how=how)
    return out.drop("__shard")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str] | None = None,
    right_tiebreak: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) sharing the key.

    ``right_tiebreak``: column that totally orders right rows sharing a
    timestamp (the greatest one wins) — keeps the result deterministic.

    Implemented with the union+window pattern — NOT a per-left-row range
    probe: tag both sides, sort each key partition once by time, and
    carry the most recent right payload forward with
    ``last(..., ignorenulls=True)``. Cost = one shuffle of (|L|+|R|) rows
    on the key — the same plan a dedicated time-series engine uses, and
    it survives arbitrarily many rows per key without a cross product.

    NULL semantics mirror the SQL correlated form (``r.key = l.key AND
    r.ts <= l.ts``): a right row with a NULL timestamp or NULL key can
    never satisfy the predicate and is dropped from the match side (the
    window would otherwise sort it FIRST and carry its payload into
    every earlier left row); left rows with NULL ts/key simply get no
    match. ``right_vals`` may not collide with left column names —
    the attach would silently clobber the left column.
    """
    right_vals = right_vals or [
        c for c in right.columns if c not in set(on) | {right_ts}
    ]
    clash = [c for c in right_vals if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join: right_vals {clash} collide with left columns — "
            "rename the right side (or pass aliased right_vals) first"
        )
    payload = F.struct(*[F.col(c) for c in right_vals])
    # tie-break orders on the column's NATURAL type — casting a 64-bit
    # id to double would collapse values above 2^53 into equal keys and
    # silently break the determinism the tiebreak exists to provide
    if right_tiebreak:
        tb = F.col(right_tiebreak)
        tb_type = right.schema[right_tiebreak].dataType.simpleString()
    else:
        tb, tb_type = F.lit(0.0), "double"

    l_tag = left.withColumn("__t", F.col(left_ts).cast("timestamp")).withColumn(
        "__src", F.lit(1)
    ).withColumn("__tb", F.lit(None).cast(tb_type)).withColumn(
        "__payload",
        F.lit(None).cast(right.select(payload.alias("p")).schema["p"].dataType),
    )
    null_key = F.lit(False)
    for k in on:
        null_key = null_key | F.col(k).isNull()
    r_tag = (
        # SQL predicate semantics: NULL ts / NULL key never matches
        right.where(F.col(right_ts).isNotNull() & ~null_key)
        .select(
            *on,
            F.col(right_ts).cast("timestamp").alias("__t"),
            F.lit(0).alias("__src"),
            tb.alias("__tb"),
            payload.alias("__payload"),
        )
    )
    # Align schemas: right side lacks the left columns — fill with NULLs
    # (one select, not a withColumn-per-column re-analysis loop).
    l_types = dict(l_tag.dtypes)
    left_only = [c for c in l_tag.columns if c not in r_tag.columns]
    r_tag = r_tag.select(
        *r_tag.columns,
        *[F.lit(None).cast(l_types[c]).alias(c) for c in left_only],
    )
    unioned = l_tag.select(*l_tag.columns).unionByName(r_tag.select(*l_tag.columns))

    # At equal timestamps: right rows sort before left for `<=`, after
    # left for strict `<`; among right rows, the tiebreak orders them so
    # `last()` picks the greatest.
    if not strict:
        order = [F.col("__t").asc(), F.col("__src").asc(), F.col("__tb").asc_nulls_last()]
        w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    else:
        order = [F.col("__t").asc(), F.col("__src").desc(), F.col("__tb").asc_nulls_last()]
        w = Window.partitionBy(*on).orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.where(F.col("__src") == 1).drop("__t", "__src", "__tb", "__payload")
    return out.select(
        *[c for c in out.columns if c != "__match"],
        *[F.col(f"__match.{c}").alias(c) for c in right_vals],
    )
