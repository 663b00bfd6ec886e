"""Batch 7 operator battery: deterministic per-group reservoir
sampling, corpus concatenation offsets (the pre-packing layout step),
and a Bloom-filter membership certification.

Scale design notes:
- **Per-group reservoir** is the fixed-k companion of the rate-based
  ``stratified_sample_orders``: rank rows inside each stratum by a
  digest of their key and keep the first k. Membership is a pure
  function of (key, k), so re-runs and both engines draw the identical
  sample; the rank ≤ k predicate compiles to WindowGroupLimit, which
  keeps per-group top-k heaps map-side instead of sorting whole groups.
- **Concat offsets** assign every document its [start, end) token span
  in the virtual concatenation EOS-joined in (source, doc_id) order —
  what a pretraining data loader needs to slice fixed-length sequences
  without materializing the concatenated corpus. Two-level cumulative
  sums keep it scalable: an intra-source running sum (window partitioned
  by source) plus a per-source base offset (window over the tiny source
  rollup) — no global single-partition window ever sees corpus rows.
- **Bloom certification** follows the self-certifying verdict pattern
  (``freq_items_verdict_returnflag``): the filter is built entirely
  from deterministic digest arithmetic (k=3 hash functions from
  disjoint sha-256 hex slices, m=1024 bits packed into 32 BIGINT words
  by a bit_or aggregate), so the oracle can replay the exact same
  construction and the hash gate certifies the sketch's contract —
  zero false negatives, false-positive count reported exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import fixture_table

    return fixture_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Deterministic fixed-k reservoir per group
# --------------------------------------------------------------------------

_RESERVOIR_K = 10


@query(
    "reservoir_sample_per_segment",
    oracle=f"""
    WITH keyed AS (
      SELECT c_mktsegment, c_custkey,
             substring(sha256(CAST(c_custkey AS VARCHAR)), 1, 16) AS dig
      FROM customer)
    SELECT c_mktsegment, c_custkey,
           CAST(row_number() OVER (PARTITION BY c_mktsegment
                                   ORDER BY dig, c_custkey) AS BIGINT) AS rk
    FROM keyed
    QUALIFY rk <= {_RESERVOIR_K}
    """,
)
def reservoir_sample_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample per stratum: the {_RESERVOIR_K}
    customers per market segment whose key digests rank lowest — the
    reproducible replacement for per-group reservoir sampling (RNG
    reservoirs differ per run/engine; digest order is a pure function
    of the key).

    The rank ≤ k filter compiles to WindowGroupLimit: per-partition
    top-k heaps prune map-side before the one stratum-keyed shuffle, so
    group size never inflates the sort. Digest order is uniform-ish by
    construction (sha-256), giving each row equal inclusion odds within
    its stratum."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_mktsegment",
        "c_custkey",
        F.substring(F.sha2(F.col("c_custkey").cast("string"), 256), 1, 16).alias(
            "dig"
        ),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("dig", "c_custkey")
    return (
        cust.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= _RESERVOIR_K)
        .select("c_mktsegment", "c_custkey", "rk")
    )


# --------------------------------------------------------------------------
# Corpus concatenation offsets (pre-packing layout)
# --------------------------------------------------------------------------


@query(
    "doc_concat_eos_offsets",
    oracle="""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
                  AS BIGINT) + 1 AS span
      FROM documents),
    intra AS (
      SELECT doc_id, source, span,
             sum(span) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) - span AS intra_start
      FROM d),
    bases AS (
      SELECT source,
             sum(sum(span)) OVER (ORDER BY source ROWS UNBOUNDED PRECEDING)
               - sum(span) AS base
      FROM d GROUP BY source)
    SELECT i.doc_id, i.source,
           CAST(i.span - 1 AS BIGINT) AS n_tokens,
           CAST(b.base + i.intra_start AS BIGINT) AS seq_start,
           CAST(b.base + i.intra_start + i.span AS BIGINT) AS seq_end
    FROM intra i JOIN bases b ON i.source = b.source
    """,
)
def doc_concat_eos_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's [start, end) token span in the virtual corpus
    concatenation (EOS token appended per doc, (source, doc_id) order)
    — the layout table a pretraining loader uses to slice fixed-length
    sequences without materializing the concatenated text.

    Two-level cumulative sums: the intra-source running sum partitions
    by source (parallel), and the cross-source base offsets come from a
    window over the per-source rollup (one row per source — broadcast
    scale). No global single-partition pass touches corpus rows, which
    is what makes the layout computable at 100 TB; the final join is a
    source-keyed broadcast."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
            .cast("long")
            + 1
        ).alias("span"),
    )
    w_intra = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = d.withColumn(
        "intra_start", F.sum("span").over(w_intra) - F.col("span")
    )
    w_base = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, 0)
    bases = (
        d.groupBy("source")
        .agg(F.sum("span").alias("src_span"))
        .withColumn("base", F.sum("src_span").over(w_base) - F.col("src_span"))
        .select("source", "base")
    )
    return intra.join(F.broadcast(bases), "source").select(
        "doc_id",
        "source",
        (F.col("span") - 1).cast("long").alias("n_tokens"),
        (F.col("base") + F.col("intra_start")).cast("long").alias("seq_start"),
        (F.col("base") + F.col("intra_start") + F.col("span"))
        .cast("long")
        .alias("seq_end"),
    )


# --------------------------------------------------------------------------
# Bloom-filter membership certification
# --------------------------------------------------------------------------

#: filter geometry: m = 32 words × 32 bits = 1024 bits, k = 3 hashes
#: (32-bit words: a shift of 1::BIGINT by ≥63 overflows DuckDB's checked
#: left-shift, and Spark has no unsigned 64-bit type to dodge it) —
#: sized so the fixture build set (~hundreds of keys) runs at a few-%
#: false-positive rate, exercising both verdict columns
_BLOOM_WORDS = 32
_BLOOM_K = 3

#: member set: customers of one nation; probe set: all customers
_BLOOM_NATION = 7


def _bloom_hashes_sql(key: str) -> list[tuple[str, str]]:
    """(word_index, bit_index) SQL expression pairs for the k hashes —
    disjoint 8-hex-char slices of sha-256, exactly mirrored by
    :func:`_bloom_hashes`."""
    out = []
    for i in range(_BLOOM_K):
        h = (
            f"CAST(('0x' || substring(sha256(CAST({key} AS VARCHAR)), "
            f"{1 + 8 * i}, 8)) AS UBIGINT)"
        )
        out.append(
            (
                f"CAST(({h} % 1024) // 32 AS BIGINT)",
                f"CAST(({h} % 1024) % 32 AS BIGINT)",
            )
        )
    return out


def _bloom_hashes(key_col: str) -> list[tuple[F.Column, F.Column]]:
    out = []
    for i in range(_BLOOM_K):
        h = F.conv(
            F.substring(F.sha2(F.col(key_col).cast("string"), 256), 1 + 8 * i, 8),
            16,
            10,
        ).cast("bigint")
        bit = h % 1024
        out.append(((bit / 32).cast("long"), bit % 32))
    return out


def _bloom_verdict_oracle() -> str:
    hashes = _bloom_hashes_sql("c_custkey")
    probes = " UNION ALL ".join(
        f"SELECT c_custkey, is_member, {w} AS word_idx, {b} AS bit_idx FROM keys"
        for w, b in hashes
    )
    builds = " UNION ALL ".join(
        f"SELECT {w} AS word_idx, {b} AS bit_idx FROM keys WHERE is_member"
        for w, b in hashes
    )
    return f"""
    WITH keys AS (
      SELECT c_custkey, c_nationkey = {_BLOOM_NATION} AS is_member
      FROM customer),
    words AS (
      SELECT word_idx, bit_or(CAST(1 AS BIGINT) << bit_idx) AS word
      FROM ({builds}) GROUP BY word_idx),
    probe AS ({probes}),
    hits AS (
      SELECT p.c_custkey, p.is_member,
             bool_and(((w.word >> p.bit_idx) & 1) = 1) AS in_bloom
      FROM probe p JOIN words w ON p.word_idx = w.word_idx
      GROUP BY p.c_custkey, p.is_member)
    SELECT
      CAST(count(*) FILTER (WHERE is_member) AS BIGINT) AS n_members,
      CAST(count(*) FILTER (WHERE is_member AND NOT in_bloom) AS BIGINT)
        AS n_false_negatives,
      CAST(count(*) FILTER (WHERE NOT is_member AND in_bloom) AS BIGINT)
        AS n_false_positives,
      CAST(count(*) FILTER (WHERE NOT is_member) AS BIGINT) AS n_non_members
    FROM hits
    """


@query("bloom_membership_verdict", oracle=_bloom_verdict_oracle())
def bloom_membership_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter certification (self-certifying verdict pattern):
    build a 1024-bit / 3-hash Bloom filter over one nation's customers
    with pure digest arithmetic (disjoint sha-256 slices → (word, bit),
    ``bit_or`` packs 32 BIGINT words), probe EVERY customer through it,
    and report the contract: false negatives (must be 0 — the Bloom
    guarantee) and the exact false-positive count.

    Everything is deterministic, so the oracle replays the identical
    construction and the value hash certifies both the guarantee and
    the FP rate. The filter table is 32 rows — at scale it broadcasts
    to prefilter a join's big side (the engine-internal runtime-filter
    pattern, here materialized and certifiable); probes cost one
    k-row explode + a broadcast join, no shuffle of the probed side."""
    keys = _t(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_nationkey") == _BLOOM_NATION).alias("is_member")
    )
    hashes = _bloom_hashes("c_custkey")
    probe = keys.select(
        "c_custkey",
        "is_member",
        F.explode(
            F.array(
                *[
                    F.struct(w.alias("word_idx"), b.alias("bit_idx"))
                    for w, b in hashes
                ]
            )
        ).alias("h"),
    ).select("c_custkey", "is_member", "h.word_idx", "h.bit_idx")
    words = (
        probe.where(F.col("is_member"))
        .groupBy("word_idx")
        .agg(
            # SQL-expr form: the Python shiftleft() binding only takes a
            # literal shift amount, the SQL function accepts a column
            F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bit_idx)")).alias(
                "word"
            )
        )
    )
    hits = (
        probe.join(F.broadcast(words), "word_idx")
        .groupBy("c_custkey", "is_member")
        .agg(
            F.min(F.expr("(shiftright(word, bit_idx) & 1) = 1")).alias("in_bloom")
        )
    )
    return hits.agg(
        F.count(F.when(F.col("is_member"), 1)).cast("long").alias("n_members"),
        F.count(F.when(F.col("is_member") & ~F.col("in_bloom"), 1))
        .cast("long")
        .alias("n_false_negatives"),
        F.count(F.when(~F.col("is_member") & F.col("in_bloom"), 1))
        .cast("long")
        .alias("n_false_positives"),
        F.count(F.when(~F.col("is_member"), 1)).cast("long").alias("n_non_members"),
    )
