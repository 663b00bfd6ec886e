"""Batch 26 operator battery — resampling statistics & iterative graph
peeling, both in deterministic closed form: hash-seeded Poisson
bootstrap confidence intervals, and k-core decomposition by unrolled
peeling.

Scale design notes:
- **Poisson bootstrap** is THE distributed bootstrap: classical
  resampling needs the whole sample in one place, but Poisson(1)
  per-row weights are independent, so every replicate is a weighted
  map over the partitioned data. Weights here are content-addressed
  (inverse-CDF over a sha-256 uniform), not RNG — identical across
  engines, partitionings, and retries. B replicates = one explode of a
  B-element sequence, one grouped aggregate; replicate means use exact
  integer sums.
- **k-core** is inherently iterative (peel nodes under degree k until
  fixpoint). The plan unrolls a fixed number of peels — each round is
  one degree aggregate + one semi-join, the loop builds the PLAN only
  (no driver actions between rounds) — and the pytest gate proves the
  fixture converges within the unroll, so the bounded plan equals the
  true k-core. The procedurally-looped analog is
  ``connected_components``; this is the in-plan form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import fixture_table

    return fixture_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Hash-seeded Poisson bootstrap CI for the mean event value
# --------------------------------------------------------------------------

_BOOT_B = 20
#: Poisson(1) inverse-CDF thresholds on a 1e6 grid: P(X<=k) for k=0..4
_POIS_CDF_MICRO = (367879, 735758, 919698, 981011, 996340)


def _boot_w_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t} THEN {k}" for k, t in enumerate(_POIS_CDF_MICRO)
    )
    return f"CASE {arms} ELSE 5 END"


@query(
    "poisson_bootstrap_ci_event_mean",
    oracle=f"""
    WITH pts AS (
      SELECT event_id,
             CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents
      FROM events),
    reps AS (
      SELECT b, cents,
             CAST(('0x' || substring(sha256('boot:' || CAST(event_id AS VARCHAR)
                                            || ':' || CAST(b AS VARCHAR)), 1, 8))
                  AS UBIGINT) % 1000000 AS u
      FROM pts CROSS JOIN (SELECT unnest(range(1, {_BOOT_B} + 1)) AS b)),
    means AS (
      SELECT b,
             CAST(floor(CAST(sum(({_boot_w_sql('u')}) * cents) AS DOUBLE) * 1e6
                        / sum({_boot_w_sql('u')})) AS BIGINT) AS m
      FROM reps GROUP BY b),
    full_m AS (
      SELECT CAST(count(*) AS BIGINT) AS n_events,
             CAST(floor(CAST(sum(cents) AS DOUBLE) * 1e6 / count(*)) AS BIGINT)
               AS mean_micro
      FROM pts)
    SELECT n_events, mean_micro,
           (SELECT CAST(min(m) AS BIGINT) FROM means) AS boot_lo_micro,
           (SELECT CAST(max(m) AS BIGINT) FROM means) AS boot_hi_micro,
           CAST({_BOOT_B} AS BIGINT) AS n_replicates
    FROM full_m
    """,
)
def poisson_bootstrap_ci_event_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean event value via the
    POISSON bootstrap — the resampling scheme that distributes: instead
    of drawing n rows with replacement (which needs global coordination),
    each row enters replicate b with multiplicity ~ Poisson(1), drawn
    here by inverse-CDF over a content-addressed sha-256 uniform — no
    RNG state, identical on both engines and on any partitioning or
    retry. The reported interval is the range of the {b} replicate
    means (a conservative ~90% CI at this B; production runs use
    B≈200 and the 2.5/97.5 percentiles — same plan, bigger sequence).

    One B-element sequence explode + one grouped aggregate; replicate
    means are floored divisions of exact integer sums.""".format(b=_BOOT_B)
    pts = _t(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("cents"),
    )
    reps = pts.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.sha2(
                    F.concat(
                        F.lit("boot:"),
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    ),
                    256,
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 1000000
    )
    w = F.when(u < _POIS_CDF_MICRO[0], 0)
    for k, t in enumerate(_POIS_CDF_MICRO[1:], start=1):
        w = w.when(u < t, k)
    w = w.otherwise(5)
    means = (
        reps.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.floor(
                F.sum(F.col("w") * F.col("cents")).cast("double")
                * 1e6
                / F.sum("w")
            )
            .cast("long")
            .alias("m")
        )
    )
    ci = means.agg(
        F.min("m").cast("long").alias("boot_lo_micro"),
        F.max("m").cast("long").alias("boot_hi_micro"),
    )
    full_m = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.floor(F.sum("cents").cast("double") * 1e6 / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_micro"),
    )
    return full_m.join(ci).select(
        "n_events",
        "mean_micro",
        "boot_lo_micro",
        "boot_hi_micro",
        F.lit(_BOOT_B).cast("long").alias("n_replicates"),
    )


# --------------------------------------------------------------------------
# k-core decomposition by unrolled peeling
# --------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ROUNDS = 3


def _kcore_oracle() -> str:
    sql = """
    WITH fact AS (
      SELECT least(c.c_nationkey, s.s_nationkey) AS a,
             greatest(c.c_nationkey, s.s_nationkey) AS b,
             count(*) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE c.c_nationkey <> s.s_nationkey
      GROUP BY 1, 2),
    thr AS (SELECT 1.1 * sum(w) / count(*) AS t FROM fact),
    e0 AS (SELECT a, b FROM fact CROSS JOIN thr WHERE w >= t)
    """
    prev = "e0"
    for r in range(1, _KCORE_ROUNDS + 1):
        sql += f""",
    d{r} AS (
      SELECT nk, count(*) AS deg FROM (
        SELECT a AS nk FROM {prev} UNION ALL SELECT b FROM {prev})
      GROUP BY nk HAVING count(*) >= {_KCORE_K}),
    e{r} AS (
      SELECT e.a, e.b FROM {prev} e
      JOIN d{r} da ON e.a = da.nk
      JOIN d{r} db ON e.b = db.nk)"""
        prev = f"e{r}"
    sql += f"""
    SELECT CAST(nk AS BIGINT) AS nationkey, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT a AS nk FROM {prev} UNION ALL SELECT b FROM {prev})
    GROUP BY nk ORDER BY nationkey
    """
    return sql


@query("kcore3_trade_graph_unrolled", oracle=_kcore_oracle())
def kcore3_trade_graph_unrolled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{k}-core of the thresholded nation co-trade graph (edges kept
    when their lineitem weight exceeds 1.1× the mean edge weight, so
    the dense trade graph sparsifies), computed by UNROLLED peeling:
    each round drops nodes of degree < {k} and the edges touching
    them; {r} rounds are baked into one plan — the Python loop builds
    the PLAN, it never acts — and the pytest gate proves the fixture
    reaches the peeling fixpoint within the unroll, so this bounded
    plan IS the k-core.

    Each round is one degree aggregate + two semi-joins on a
    node-scale table; the only fact-scale work is the initial edge
    aggregate (the same tree as PageRank / triangle counting). The
    loop-until-convergence analog with driver-side stopping is
    ``connected_components``.""".format(k=_KCORE_K, r=_KCORE_ROUNDS)
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    fact = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == cust.c_custkey,
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == supp.s_suppkey,
        )
        .where(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(
            F.least("c_nationkey", "s_nationkey").alias("a"),
            F.greatest("c_nationkey", "s_nationkey").alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    thr = fact.agg((1.1 * F.sum("w") / F.count(F.lit(1))).alias("t"))
    edges = (
        fact.join(F.broadcast(thr))
        .where(F.col("w") >= F.col("t"))
        .select("a", "b")
        # node-scale from here on; truncate the fact-scale lineage once
        # and fold the ≤|N|²/2-row edge list into one partition so the
        # peeling rounds don't pay 32-way shuffle setup per iteration
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.col("a").alias("nk"))
            .unionAll(edges.select(F.col("b").alias("nk")))
            .groupBy("nk")
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= _KCORE_K)
            .select("nk")
        )
        # deg is node-scale: broadcast both survivor probes so each
        # peeling round adds zero shuffles beyond its degree aggregate
        edges = (
            edges.join(F.broadcast(deg.withColumnRenamed("nk", "a")), "a", "left_semi")
            .join(F.broadcast(deg.withColumnRenamed("nk", "b")), "b", "left_semi")
            .select("a", "b")
        )
    return (
        edges.select(F.col("a").alias("nk"))
        .unionAll(edges.select(F.col("b").alias("nk")))
        .groupBy("nk")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .select(F.col("nk").cast("long").alias("nationkey"), "degree")
        .orderBy("nationkey")
    )
