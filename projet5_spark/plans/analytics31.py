"""Batch 33 operator battery — round-10 certification closures.

- **engine-neutral SimHash near-dup** — the production ``simhash_near_dup``
  is rows-only (xxhash64 signatures have no DuckDB replay). This twin
  computes the SAME algorithm — per-bit majority vote over shingle
  hashes, block-banded candidate generation, hamming verification —
  on a sha-256-derived 60-bit grid both engines evaluate identically,
  converting "SimHash on Spark" from a rows-only claim to a
  hash-equal driver row (the ``minhash_jaccard_estimate_gate``
  precedent, applied to the full pipeline rather than an eval slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import fixture_table

    return fixture_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# SimHash near-dup, sha-256 grid (certified twin of simhash_near_dup)
# --------------------------------------------------------------------------

_SH_BITS = 60  # 15 hex chars of sha256 -> BIGINT, the conv() precedent
_SH_HAM = 3  # near-dup threshold: hamming distance <= 3
#: 5 blocks of 12 bits; hamming <= 3 flips bits in at most 3 blocks, so
#: at least 2 of 5 blocks match -> every qualifying pair collides on at
#: least one of the C(5,2)=10 block-pair band keys (pigeonhole; the
#: Manku WWW'07 scheme, same as the production path's 64-bit banding)
_SH_NBLOCKS = 5
_SH_BLOCK_W = 12

_SH_DUCK_SHINGLES = (
    "[toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] "
    "FOR i IN range(1, greatest(len(toks)-1, 1))]"
)


def _sh_oracle() -> str:
    ones = ", ".join(
        f"sum((h >> {i}) & 1) AS o{i}" for i in range(_SH_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN 2 * o{i} > n THEN {1 << i} ELSE 0 END"
        for i in range(_SH_BITS)
    )
    return f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, s FROM (
        SELECT doc_id, unnest({_SH_DUCK_SHINGLES}) AS s
        FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t1) t2),
    hashes AS (
      SELECT doc_id,
             CAST(CAST(('0x' || substring(sha256(s), 1, 15)) AS UBIGINT)
                  AS BIGINT) AS h
      FROM sh),
    votes AS (SELECT doc_id, count(*) AS n, {ones}
              FROM hashes GROUP BY doc_id),
    sig AS (SELECT doc_id, CAST(({sig}) AS BIGINT) AS simhash FROM votes)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {_SH_HAM}
    """


@query("simhash_sha_near_dup", oracle=_sh_oracle())
def simhash_sha_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming ≤ {ham} over {bits}-bit
    signatures) on the engine-neutral sha-256 grid: per-shingle hash =
    leading 15 hex chars of ``sha256(shingle)`` as BIGINT, signature
    bit i = majority vote of hash bit i over the doc's distinct
    shingles (strict ``2·ones > n`` — tie-stable in both engines),
    candidates from the 5-block/pair banding (pigeonhole-complete for
    hamming ≤ {ham}), verification = exact ``bit_count(a XOR b)``.
    The DuckDB oracle replays signatures bit-for-bit and verifies with
    an all-pairs hamming scan, so hash equality certifies the ENTIRE
    pipeline — signature fold, banding completeness, and verify — not
    just row counts (cf. rows-only ``simhash_near_dup``, whose
    xxhash64 grid DuckDB cannot evaluate).

    Scale shape is the production path's: one doc-keyed vote aggregate
    (packed 16-bit lanes, 15 agg columns instead of 60), 10 band rows
    per doc, equi-join on ~24-bit band keys, pair-level verify. This
    twin omits the production bucket cap so its output is EXACTLY the
    all-pairs oracle's on any input; the capped form stays the scale
    path (llm.simhash_near_dup docstring on why degenerate buckets are
    exact-dedup's job)."""
    from .llm import shingle_rows

    docs = _t(spark, sf_dir, "documents")
    sh = shingle_rows(spark, docs).distinct()
    h = F.conv(F.substring(F.sha2(F.col("s"), 256), 1, 15), 16, 10).cast("bigint")
    hashed = sh.select("doc_id", h.alias("h"))

    # 60 one-bit vote counters packed into 15 longs of 4x16-bit lanes
    # (shingle counts < 2^16); SQL-string construction as in
    # llm.simhash_signatures — the Column API costs thousands of py4j
    # round-trips for trees this wide
    def packed(k: int) -> str:
        lanes = " + ".join(
            f"shiftleft(shiftrightunsigned(h, {4 * k + f}) & 1, {16 * f})"
            for f in range(4)
        )
        return f"sum({lanes}) AS p{k}"

    votes = hashed.groupBy("doc_id").agg(
        F.expr("count(1) AS n"),
        *[F.expr(packed(k)) for k in range(_SH_BITS // 4)],
    )

    def ones(i: int) -> str:
        return f"(shiftrightunsigned(p{i // 4}, {16 * (i % 4)}) & 65535)"

    sig_expr = " + ".join(
        f"IF({ones(i)} * 2 > n, {1 << i}L, 0L)" for i in range(_SH_BITS)
    )
    sigs = votes.select("doc_id", F.expr(f"({sig_expr}) AS simhash"))

    def block(i: int) -> str:
        mask = (1 << _SH_BLOCK_W) - 1
        return f"(shiftrightunsigned(simhash, {i * _SH_BLOCK_W}) & {mask})"

    combos = [
        (i, j) for i in range(_SH_NBLOCKS) for j in range(i + 1, _SH_NBLOCKS)
    ]
    structs = ", ".join(
        f"struct({c} AS band, shiftleft({block(i)}, {_SH_BLOCK_W}) | {block(j)} AS key)"
        for c, (i, j) in enumerate(combos)
    )
    bands = sigs.selectExpr(
        "doc_id", "simhash", f"explode(array({structs})) AS bk"
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("sig_a ^ sig_b")).cast("int")
    return cand.where(ham <= _SH_HAM).select(
        "doc_a", "doc_b", ham.alias("hamming")
    )


simhash_sha_near_dup.__doc__ = simhash_sha_near_dup.__doc__.format(
    ham=_SH_HAM, bits=_SH_BITS
)
