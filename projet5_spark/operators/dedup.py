"""Deduplication operators.

Reference semantics (SURVEY.md §2.1): R7 full-row distinct
(migration.py:141), R10 keyed dim extraction (:160-187), R13
first-seen-wins fact dedup (:200-202) — the reference does these with a
pandas ``drop_duplicates`` and two unbounded driver-side dicts. Here
every variant is a shuffle-on-key set operation: driver memory is O(1)
and the work distributes.

Scale notes
-----------
- ``dropDuplicates(keys)`` = hash aggregate on the keys: partial
  map-side combine, shuffle carries distinct keys only.
- first-seen-wins needs a total order; at scale prefer an explicit
  ordinal column (ingest sequence) over ``monotonically_increasing_id``
  (partition-order dependent, not stable across re-reads).
- For text corpora, exact dedup on a 64/256-bit digest of the content
  shuffles ~8-32 bytes per row instead of the document body — at 100 TB
  of text that is the difference between shuffling hashes and shuffling
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keyed_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """R10: one arbitrary survivor per key (``dropDuplicates(keys)``).
    Correct whenever the output only carries key columns (dim
    extraction) — survivor choice is immaterial."""
    return df.dropDuplicates(keys)


def first_seen_dedup(
    df: DataFrame, keys: list[str], order_by: list[Column | str]
) -> DataFrame:
    """R13: first-seen-wins — keep, per key, the row that is minimal
    under ``order_by`` (the reference's "first CSV row with that key",
    migration.py:200-202, made deterministic per SURVEY.md §7.4.3).

    ``row_number`` over (partition by keys, order by ordinal) — one
    shuffle on the keys; AQE splits skewed key partitions.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_seen_dedup_agg(
    df: DataFrame, keys: list[str], order_cols: list[str],
    *, float_keys_canonical: bool = False,
) -> DataFrame:
    """R13 via aggregation instead of a window: ``min(struct(order
    columns, payload columns))`` — one hash aggregate with map-side
    partial min, no per-partition sort, no row_number materialization.

    Equivalent to :func:`first_seen_dedup` whenever ``order_cols``
    totally order rows within a key (struct comparison is
    lexicographic, so the payload tail is never compared). Prefer this
    at scale: the shuffle carries one candidate row per key per mapper
    instead of every row.

    Wide key sets (≥ 8 columns — e.g. full-row dedup) group on a
    null-safe sha256 digest of the key columns instead of the raw
    tuple: the hash-aggregate key drops to 32 bytes, which measured
    ~25% faster on the 15-column healthcare dedup at sf0.1 and shrinks
    with key width at scale. The encoding is injective — each field is
    length-prefixed (no separator-injection collisions) and NULL gets
    its own tag (never conflated with any string value) — so the only
    merge risk is a true SHA-256 collision (~2⁻¹²⁸). Float/double key
    columns keep the raw-tuple branch regardless of width: grouping
    normalizes ``-0.0 == 0.0`` while their string forms differ, and the
    two branches must agree.

    ``float_keys_canonical``: opt-in for callers that can PROVE their
    float/double key columns never contain ``-0.0`` or NaN (e.g. money
    amounts parsed from positive decimals). Grouping's float
    normalization is then the identity, so the fast full-row path and
    the digest path stay byte-identical to the struct branch and the
    float guard is waived. Leave False when in doubt — the default is
    the safe branch.
    """
    payload_cols = [c for c in df.columns if c not in keys and c not in order_cols]
    dtypes = dict(df.dtypes)
    has_float_key = (
        any(dtypes[c] in ("float", "double") for c in keys)
        and not float_keys_canonical
    )
    if not payload_cols and len(order_cols) == 1 and not has_float_key:
        # full-row dedup: every row in a group IS the key tuple, so
        # min_by(struct) degenerates to min(ordinal). That swaps the
        # sort-based aggregate (struct buffers aren't hash-aggregable)
        # for a pure HashAggregate with map-side partial min — no
        # per-partition sorts, same shuffle key set. Float/double keys
        # fall through to the min_by(struct) branch: grouping emits the
        # normalized key (-0.0→0.0, canonical NaN) while min_by emits
        # the surviving row's stored bytes, and the branches must agree.
        return (
            df.groupBy(*keys)
            .agg(F.min(order_cols[0]).alias(order_cols[0]))
            .select(*df.columns)
        )
    # ONE struct buffer, not two: ``min(struct(order, rest))`` picks the
    # same survivor as ``min_by(struct(all), struct(order))`` whenever
    # order_cols totally order rows within a key (struct comparison is
    # lexicographic, so the trailing payload fields are never reached) —
    # and when they DON'T, it is strictly better: the payload fields
    # break the tie deterministically where min_by picks a race winner.
    # Aggregate state drops from struct(all)+struct(order) to one
    # struct that also omits the group-by keys (constant within a
    # group, re-emitted from the grouping columns). On the x100 stress
    # battery this halved the query's state bytes: struct buffers are
    # not UnsafeRow-mutable, so this aggregate runs as
    # ObjectHashAggregate with sort-fallback, and sorted bytes scale
    # with buffer width (8.0 GB -> 3.9 GB spill, 24.3 s -> 15.6 s).
    if len(keys) >= 8 and not has_float_key:
        # injective flattening: "N" for NULL, "V<len>:<value>" otherwise
        parts = []
        for c in keys:
            s = F.col(c).cast("string")
            parts.append(
                F.when(s.isNull(), F.lit("N")).otherwise(
                    F.concat(F.lit("V"), F.length(s).cast("string"), F.lit(":"), s)
                )
            )
        digest = F.sha2(F.concat(*parts), 256)
        # digest grouping hides the key columns, so the struct must
        # carry them to re-emit the survivor's stored key bytes
        combined = F.struct(
            *[F.col(c) for c in order_cols + keys + payload_cols]
        )
        agg = (
            df.withColumn("__k", digest)
            .groupBy("__k")
            .agg(F.min(combined).alias("__row"))
        )
        return agg.select(
            *[F.col(f"__row.{c}").alias(c) for c in df.columns]
        )
    if has_float_key:
        # float keys: grouping emits the NORMALIZED key (-0.0 -> 0.0,
        # canonical NaN) — carry the keys in the struct instead so the
        # output holds the survivor's stored bytes, matching the window
        # form's semantics
        combined = F.struct(
            *[F.col(c) for c in order_cols + keys + payload_cols]
        )
        agg = df.groupBy(*keys).agg(F.min(combined).alias("__row"))
        return agg.select(
            *[F.col(f"__row.{c}").alias(c) for c in df.columns]
        )
    combined = F.struct(*[F.col(c) for c in order_cols + payload_cols])
    agg = df.groupBy(*keys).agg(F.min(combined).alias("__row"))
    out = {c: F.col(f"__row.{c}") for c in order_cols + payload_cols}
    return agg.select(
        *[out.get(c, F.col(c)).alias(c) for c in df.columns]
    )


def packed_min_dedup(
    df: DataFrame,
    keys: list[str],
    fields: list[tuple[str, Column, int]],
    *,
    pre_shuffle: bool = True,
) -> DataFrame:
    """First-seen-wins dedup whose aggregate is a pure whole-stage-codegen
    ``HashAggregate`` — no sort anywhere in the plan.

    ``min(struct(...))`` and ``min_by(struct, struct)`` both plan as
    SortAggregate (struct buffers are not UnsafeRow-mutable and
    Min/MaxMinBy are not TypedImperative, so neither HashAggregate nor
    ObjectHashAggregate applies): BOTH stages sort every input row,
    which at x100 stress was 8 GB of sort spill for the lineitem
    first-seen dedup. Decimals, however, ARE UnsafeRow-mutable — so
    packing the (order, payload) tuple into one order-preserving
    DECIMAL(38,0) turns the whole reduction into ``min(decimal)``:
    hash aggregation, map-side combinable, 16-byte state per group.

    ``fields``: ``(name, column, digits)`` triples, most-significant
    first. Each column must evaluate to a NON-NEGATIVE INTEGRAL value
    strictly below ``10**digits`` (caller encodes domain values, e.g.
    money as cents via ``floor(x*100)``); total digits must be <= 38.
    Each row is checked — an out-of-range or NULL field raises at
    execution rather than silently corrupting the ordering (decimal
    overflow would null out the row and ``min`` would skip it).

    The packed encoding is order-preserving iff each field's integral
    encoding is itself order-preserving on the caller's domain — exact
    for integers; for cent-quantized doubles it collapses values within
    the same cent, so callers must only pack quantized doubles whose
    grid the data actually lives on (cent-aligned prices).

    ``pre_shuffle=True`` repartitions by the keys BEFORE aggregating,
    trading map-side combine for contention-free maps: with small
    group fan-in (a handful of rows per key — the dedup common case)
    partial aggregation barely reduces the shuffle but makes every map
    task hold ~every group it touches, which under per-task execution
    memory pressure is exactly what spills. Post-shuffle, each task
    owns only ``groups/numPartitions`` entries (x100 stress: 8 GB
    spill -> 0). Set False for high-duplication inputs where map-side
    combine collapses many rows per key.

    Returns one row per key: the key columns plus one BIGINT column
    per field, holding the SURVIVOR row's encoded field values (the
    caller decodes, e.g. cents back to a 2-decimal double).
    """
    from decimal import Decimal

    total = sum(d for _, _, d in fields)
    if total > 38:
        raise ValueError(f"packed fields need {total} digits > 38")
    packed = None
    shift = total
    for name, col, digits in fields:
        shift -= digits
        bound = 10**digits
        guarded = F.when(
            col.isNotNull() & (col >= 0) & (col < F.lit(Decimal(bound))),
            col.cast("decimal(38,0)"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    f"packed_min_dedup: field '{name}' out of "
                    f"[0, {bound}) or NULL"
                )
            )
        )
        # 10**shift can exceed a 64-bit long — ship it as a Decimal
        # literal so py4j does not try to box it as a Java long
        term = guarded * F.lit(Decimal(10**shift)).cast("decimal(38,0)")
        packed = term if packed is None else packed + term
    src = df.repartition(*keys) if pre_shuffle else df
    agg = src.groupBy(*keys).agg(F.min(packed).alias("__p"))
    out = [F.col(k) for k in keys]
    shift = total
    for name, _, digits in fields:
        shift -= digits
        # strip higher fields with a decimal mod BEFORE the integral
        # div so the BIGINT cast never sees more than `digits` digits
        # (the top field skips the mod: a 10^38 literal would not
        # parse as DECIMAL(38,0), and __p < 10^total already)
        if shift + digits < 38 and shift + digits < total:
            ex = F.expr(
                f"CAST((__p % {10 ** (shift + digits)})"
                f" div {10**shift} AS BIGINT)"
            )
        else:
            ex = F.expr(f"CAST(__p div {10**shift} AS BIGINT)")
        out.append(ex.alias(name))
    return agg.select(*out)


def exact_text_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact corpus dedup: group rows by content digest, keep the row
    with the minimal id (deterministic survivor).

    Digest-first means the shuffle key is 32 bytes regardless of
    document size; the survivor's body is recovered by a self-semi-join
    pattern folded into one aggregation (min-id per digest, then rejoin
    is avoided by carrying ``min_by``).
    """
    h = F.sha2(F.col(text_col), 256)
    return (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(
            F.min(id_col).alias(id_col),
            F.min_by(text_col, F.col(id_col)).alias(text_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .drop("__h")
    )
