"""Batch 17 operator battery — ordered-data analytics and storage-layout
advice: OHLC bars, key-gap range detection, weighted median, RLE run
profiling, dictionary-encoding advice, and Mann-Kendall trend tests.

Scale design notes:
- **OHLC bars** never sort globally: open/close come from full-frame
  ``first_value``/``last_value`` windows over (event_type, day)
  partitions — bounded, evenly distributed state — and high/low/count
  fold in one hash aggregate. Values quantize to exact integer cents
  before any aggregation.
- **Gap detection** avoids the classic single-partition global window:
  keys bucket by value range, ``lead`` runs inside each bucket, and
  only the per-bucket (min, max) summary — O(#buckets) rows — crosses
  a global window to stitch boundary gaps. Same output as the naive
  global-sort plan at any scale.
- **Weighted median** pre-aggregates to distinct values per group
  before the cumulative window, so window state is value-cardinality,
  not row-cardinality; the pick is the smallest value whose cumulative
  weight reaches half the total — all exact BIGINT arithmetic.
- **RLE run profile / dict advisor** are single-pass: one shared
  (l_orderkey, l_linenumber) window computes run-start flags for every
  candidate column at once (runs are measured within the table's
  natural clustering — exactly what a columnar writer's row groups
  see), and one aggregate row unpivots into the per-column report.
- **Mann-Kendall** runs its quadratic sign-pair join per event_type
  over *daily pre-aggregates* — ≤ C(days, 2) pairs per type no matter
  how many raw events — the standard way to trend-test at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import fixture_table

    return fixture_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# OHLC daily bars per event type
# --------------------------------------------------------------------------


@query(
    "ohlc_daily_event_bars",
    oracle="""
    WITH pts AS (
      SELECT event_type, CAST(ts AS DATE) AS day, epoch_us(ts) AS us,
             CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS cents
      FROM events),
    fr AS (
      SELECT event_type, day, cents,
             first_value(cents) OVER w AS open_c,
             last_value(cents) OVER w AS close_c
      FROM pts
      WINDOW w AS (PARTITION BY event_type, day ORDER BY us, cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           max(open_c) AS open_centi, max(cents) AS high_centi,
           min(cents) AS low_centi, max(close_c) AS close_centi
    FROM fr GROUP BY event_type, day
    ORDER BY event_type, day
    """,
)
def ohlc_daily_event_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close/count bars per (event_type, day) — the
    candlestick rollup metering and market-data pipelines emit.

    Open and close are the first/last reading under the total
    (timestamp, value) order, taken with full-frame ``first_value``/
    ``last_value`` windows over (event_type, day) partitions; high/low/
    count fold in the following hash aggregate. One partition-bounded
    window plus one map-side-combinable aggregate — no global sort, and
    values are exact integer cents throughout."""
    pts = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("day"),
        F.unix_micros("ts").alias("us"),
        F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("event_type", "day")
        .orderBy("us", "cents")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    fr = pts.select(
        "event_type",
        "day",
        "cents",
        F.first_value("cents").over(w).alias("open_c"),
        F.last_value("cents").over(w).alias("close_c"),
    )
    return (
        fr.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("open_c").alias("open_centi"),
            F.max("cents").alias("high_centi"),
            F.min("cents").alias("low_centi"),
            F.max("close_c").alias("close_centi"),
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "open_centi",
            "high_centi",
            "low_centi",
            "close_centi",
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------------------------
# Missing-key gap ranges (sequence audit)
# --------------------------------------------------------------------------

#: keys per gap-scan bucket: large enough that the per-bucket summary
#: table is tiny, small enough that each lead() partition is bounded
_GAP_BUCKET = 8192


@query(
    "orderkey_gap_ranges",
    oracle="""
    WITH k AS (
      SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
      WHERE o_orderstatus = 'O'),
    s AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k)
    SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS gap_len
    FROM s WHERE nk > k + 1
    ORDER BY gap_start
    """,
)
def orderkey_gap_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-ID range report over the open-order key slice — the
    ingest-completeness audit ("which key ranges never arrived?").

    The oracle states the naive form: one global ``lead`` over every
    key, which on Spark would be a single-partition sort. The plan here
    is the scale-correct equivalent: keys bucket by value range
    (``k div 8192``), ``lead`` runs inside each bucket partition, and
    only the per-bucket (min, max) summary — O(#buckets) rows — crosses
    a global window to stitch gaps that span bucket boundaries (runs of
    entirely-missing buckets collapse into one stitched range). Output
    is identical to the global sort at any scale."""
    k = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "O")
        .select(F.col("o_orderkey").cast("long").alias("k"))
        .withColumn("b", F.floor(F.col("k") / _GAP_BUCKET))
    )
    wb = Window.partitionBy("b").orderBy("k")
    inner = (
        k.withColumn("nk", F.lead("k").over(wb))
        .where(F.col("nk") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
        )
    )
    summ = k.groupBy("b").agg(F.min("k").alias("mn"), F.max("k").alias("mx"))
    ws = Window.orderBy("b")  # bucket-count rows only: tiny by design
    bound = (
        summ.withColumn("nmn", F.lead("mn").over(ws))
        .where(F.col("nmn") > F.col("mx") + 1)
        .select(
            (F.col("mx") + 1).alias("gap_start"),
            (F.col("nmn") - 1).alias("gap_end"),
        )
    )
    return (
        inner.unionAll(bound)
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
        )
        .orderBy("gap_start")
    )


# --------------------------------------------------------------------------
# Weighted median price per return flag
# --------------------------------------------------------------------------


@query(
    "weighted_median_price_by_flag",
    oracle="""
    WITH g AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 1e2 + 0.5) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
      FROM lineitem GROUP BY l_returnflag, cents),
    c AS (
      SELECT flag, cents, wv,
             sum(wv) OVER (PARTITION BY flag ORDER BY cents) AS cw,
             sum(wv) OVER (PARTITION BY flag) AS tw
      FROM g)
    SELECT flag, CAST(max(tw) AS BIGINT) AS total_weight,
           CAST(min(cents) AS BIGINT) AS wmedian_centi
    FROM c WHERE 2 * cw >= tw
    GROUP BY flag ORDER BY flag
    """,
)
def weighted_median_price_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price whose cumulative quantity weight reaches half the
    group total — the robust "typical traded price" statistic.

    Rows pre-aggregate to distinct (flag, cents) values before any
    ordered pass, so state is value-cardinality, not row-cardinality,
    and the heavy fact scan folds map-side. The median pick is then
    TWO-LEVEL: value space buckets into coarse bins, a bin-level
    running sum (a few hundred rows per flag) locates the median bin
    and its preceding cumulative weight, and the per-value running sum
    — the part that used to walk the whole value distribution inside a
    3-partition window — runs only over the one median bin per flag.
    Prefix sums compose exactly (prev-bins cum + within-bin cum ==
    global cum), everything is BIGINT, and no window ever holds more
    than a bin's worth of values per group. At 100 TB the same pick
    runs over a per-group quantile sketch with documented tolerance
    (see ``quantile_sketch_verdict_prices``)."""
    g = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_returnflag").alias("flag"),
            F.floor(F.col("l_extendedprice") * 1e2 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
            F.col("l_quantity").cast("long").alias("wq"),
        )
        .groupBy("flag", "cents")
        .agg(F.sum("wq").cast("long").alias("wv"))
    )
    # 100-dollar value bins; ~2k bins over the fixture domain
    return weighted_median_pick(g, bin_w=10_000)


def weighted_median_pick(g: DataFrame, bin_w: int) -> DataFrame:
    """Two-level lower weighted median over a (flag, cents, wv) value
    table: per flag, the smallest ``cents`` whose cumulative ``wv``
    reaches half the group total. See
    :func:`weighted_median_price_by_flag` for the design rationale;
    tests/test_weighted_median.py drives this against a pandas twin on
    planted boundary cases (exact half-crossing at a bin edge, single
    hot value, all weight in one bin) and random distributions."""
    b = int(bin_w)
    g = (
        # exact BIGINT floor-division bin key (plain `div` truncates
        # toward zero, wrong for negative cents; float floor loses
        # exactness past 2^53) — keeps the helper exact for any long
        g.withColumn("bin", F.expr(f"(cents - (((cents % {b}) + {b}) % {b})) div {b}"))
        # two consumers: the bin-level locator and the median-bin scan
        .localCheckpoint(eager=True)
    )
    bins = g.groupBy("flag", "bin").agg(F.sum("wv").cast("long").alias("bw"))
    wb = Window.partitionBy("flag").orderBy("bin")
    wt = Window.partitionBy("flag")
    located = bins.select(
        "flag",
        "bin",
        (F.sum("bw").over(wb) - F.col("bw")).alias("prev_cum"),
        F.sum("bw").over(wb).alias("cum"),
        F.sum("bw").over(wt).alias("tw"),
    ).where(
        # the median bin: first bin whose cumulative weight crosses
        # half the total (strictly-before bins stay under half)
        (2 * F.col("cum") >= F.col("tw")) & (2 * F.col("prev_cum") < F.col("tw"))
    )
    med = g.join(
        F.broadcast(located.select("flag", "bin", "prev_cum", "tw")),
        ["flag", "bin"],
    )
    wc = Window.partitionBy("flag").orderBy("cents")
    c = med.select(
        "flag",
        "cents",
        (F.col("prev_cum") + F.sum("wv").over(wc)).alias("cw"),
        "tw",
    )
    return (
        c.where(2 * F.col("cw") >= F.col("tw"))
        .groupBy("flag")
        .agg(
            F.max("tw").cast("long").alias("total_weight"),
            F.min("cents").cast("long").alias("wmedian_centi"),
        )
        .orderBy("flag")
    )


# --------------------------------------------------------------------------
# RLE run profile (storage-layout advisor, run lengths)
# --------------------------------------------------------------------------

_RLE_COLS = ("l_returnflag", "l_linestatus", "l_quantity")


def _rle_oracle() -> str:
    flags = ", ".join(
        f"CASE WHEN lag({c}) OVER w IS NULL OR {c} <> lag({c}) OVER w "
        f"THEN 1 ELSE 0 END AS s{i}"
        for i, c in enumerate(_RLE_COLS)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, CAST(n AS BIGINT) AS n_rows, "
        f"CAST(r{i} AS BIGINT) AS n_runs, "
        f"CAST(floor(CAST(n AS DOUBLE) * 1e6 / r{i}) AS BIGINT) "
        f"AS avg_run_len_micro FROM a"
        for i, c in enumerate(_RLE_COLS)
    )
    order_cols = ", ".join(("l_linenumber",) + _RLE_COLS)
    return f"""
    WITH f AS (
      SELECT {flags}
      FROM lineitem
      WINDOW w AS (PARTITION BY l_orderkey ORDER BY {order_cols})),
    a AS (SELECT count(*) AS n,
                 {", ".join(f"sum(s{i}) AS r{i}" for i in range(len(_RLE_COLS)))}
          FROM f)
    SELECT * FROM ({arms}) ORDER BY col
    """


@query("rle_run_profile_lineitem", oracle=_rle_oracle())
def rle_run_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length profile of candidate lineitem columns under the
    table's natural clustering (l_orderkey, l_linenumber) — how many
    value runs a columnar writer's RLE encoder would see, and the mean
    run length. Long runs → RLE wins; run-per-row → don't bother.

    Single pass: one shared window computes the run-start flag for
    every candidate column at once, one aggregate folds them, and the
    single result row unpivots (``stack``) into the per-column report.
    Run boundaries are evaluated within l_orderkey partitions, which is
    what row-group-local encoding sees anyway — no global sort.

    The window order appends the profiled columns as tie-breakers:
    the fixture plants duplicate (l_orderkey, l_linenumber) pairs, so
    ordering by l_linenumber alone is non-total and tie order would be
    physical row order — session- and engine-dependent. Rows that tie
    on ALL sort keys are identical in every profiled column, so the
    residual nondeterminism cannot move a run boundary; both engines
    use the same ordering."""
    from ..operators.partitioning import sized_sort_parallelism

    li = _t(spark, sf_dir, "lineitem")
    # size the pre-window shuffle to the data: WindowExec sorts each
    # TASK partition in one go, so at the default 32 partitions the
    # x100 battery sorted ~1.9M rows per task — just past the per-task
    # execution-memory share, spilling 3.9 GB. Repartitioning on the
    # window's own partition key into size-derived slices keeps each
    # task's sort in memory (x100: zero spill) and satisfies the
    # window's ClusteredDistribution, so no second exchange appears.
    li = li.repartition(sized_sort_parallelism(li), "l_orderkey")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber", *_RLE_COLS)

    def start_flag(c: str) -> F.Column:
        col, prev = F.col(c), F.lag(c).over(w)
        return F.when(prev.isNull() | (col != prev), 1).otherwise(0)

    flags = li.select(
        *[start_flag(c).alias(f"s{i}") for i, c in enumerate(_RLE_COLS)]
    )
    a = flags.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(f"s{i}").alias(f"r{i}") for i in range(len(_RLE_COLS))],
    )
    stack_args = ", ".join(f"'{c}', r{i}" for i, c in enumerate(_RLE_COLS))
    return (
        a.selectExpr("n", f"stack({len(_RLE_COLS)}, {stack_args}) AS (col, runs)")
        .select(
            "col",
            F.col("n").cast("long").alias("n_rows"),
            F.col("runs").cast("long").alias("n_runs"),
            F.floor(F.col("n").cast("double") * 1e6 / F.col("runs"))
            .cast("long")
            .alias("avg_run_len_micro"),
        )
        .orderBy("col")
    )


# --------------------------------------------------------------------------
# Dictionary-encoding advisor (storage-layout advisor, cardinality)
# --------------------------------------------------------------------------

_DICT_COLS = ("l_returnflag", "l_linestatus", "l_shipdate", "l_partkey")


def _dict_oracle() -> str:
    aggs = ", ".join(
        f"count(DISTINCT {c}) AS d{i}, "
        f"sum(length(CAST({c} AS VARCHAR))) AS b{i}"
        for i, c in enumerate(_DICT_COLS)
    )
    arms = "\nUNION ALL\n".join(
        f"SELECT '{c}' AS col, CAST(d{i} AS BIGINT) AS ndv, "
        f"CAST(floor(CAST(b{i} AS DOUBLE) * 1e6 / n) AS BIGINT) "
        f"AS avg_len_micro, "
        f"CASE WHEN d{i} <= 256 THEN 'DICT8' WHEN d{i} <= 65536 THEN 'DICT16' "
        f"WHEN CAST(d{i} AS DOUBLE) / n <= 0.5 THEN 'DICT32' "
        f"ELSE 'PLAIN' END AS advice, "
        f"CAST(n AS BIGINT) AS n_rows FROM a"
        for i, c in enumerate(_DICT_COLS)
    )
    return f"""
    WITH a AS (SELECT count(*) AS n, {aggs} FROM lineitem)
    SELECT col, n_rows, ndv, avg_len_micro, advice
    FROM ({arms}) ORDER BY col
    """


@query("dict_encoding_advisor_lineitem", oracle=_dict_oracle())
def dict_encoding_advisor_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding advisor: exact NDV, mean encoded width, and
    a codec recommendation per candidate column — the statistics a
    table-layout service computes before choosing parquet encodings
    (NDV ≤ 2⁸ → 1-byte dictionary codes, ≤ 2¹⁶ → 2-byte, low
    NDV-to-row ratio → general dictionary, else plain).

    The NDVs come from one distinct FOLD per column — a map-side
    partially-aggregated shuffle bounded by each column's value DOMAIN
    — while the row count and byte volumes share a single plain scan.
    Packing the four ``countDistinct``s into one aggregate instead
    makes Spark Expand every row 4× through the grouping-id shuffle
    (60M → 240M rows; measured 21.9 s with 6.9 GB of sort spill at
    x100, vs ~9 s and zero spill for the fold form — column-pruned
    scans are cheaper than a 4× row expansion). At 100 TB the same
    report can swap exact NDV for HLL (``approx_distinct_parts``
    pattern) with a documented bound."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.length(F.col(c).cast("string"))).alias(f"b{i}")
            for i, c in enumerate(_DICT_COLS)
        ],
    )
    for i, c in enumerate(_DICT_COLS):
        # null-filter BEFORE the distinct fold: count(DISTINCT c)
        # excludes NULL, but distinct().count() would tally it as one
        # extra value and silently drift the 2^8/2^16 advice
        # thresholds on nullable columns
        ndv = (
            li.where(F.col(c).isNotNull())
            .select(c)
            .distinct()
            .agg(F.count(F.lit(1)).alias(f"d{i}"))
        )
        a = a.join(F.broadcast(ndv))
    stack_args = ", ".join(f"'{c}', d{i}, b{i}" for i, c in enumerate(_DICT_COLS))
    un = a.selectExpr(
        "n", f"stack({len(_DICT_COLS)}, {stack_args}) AS (col, ndv, bytes)"
    )
    return un.select(
        "col",
        F.col("n").cast("long").alias("n_rows"),
        F.col("ndv").cast("long").alias("ndv"),
        F.floor(F.col("bytes").cast("double") * 1e6 / F.col("n"))
        .cast("long")
        .alias("avg_len_micro"),
        F.when(F.col("ndv") <= 256, "DICT8")
        .when(F.col("ndv") <= 65536, "DICT16")
        .when(F.col("ndv").cast("double") / F.col("n") <= 0.5, "DICT32")
        .otherwise("PLAIN")
        .alias("advice"),
    ).select("col", "n_rows", "ndv", "avg_len_micro", "advice").orderBy("col")


# --------------------------------------------------------------------------
# Mann-Kendall trend test per event type
# --------------------------------------------------------------------------


@query(
    "mann_kendall_trend_events",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS v
      FROM events GROUP BY event_type, day),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1 WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.day < b.day),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily
          GROUP BY event_type),
    s AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s_stat FROM pairs
          GROUP BY event_type)
    SELECT event_type, n_days, s_stat,
           CAST(floor(CAST(s_stat AS DOUBLE) * 1e6
                      / (n_days * (n_days - 1) / 2)) AS BIGINT) AS tau_micro,
           CASE WHEN s_stat > 0 THEN 'increasing'
                WHEN s_stat < 0 THEN 'decreasing'
                ELSE 'flat' END AS trend
    FROM n JOIN s USING (event_type)
    ORDER BY event_type
    """,
)
def mann_kendall_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test per event type: the S
    statistic (sum of pairwise day-ordered signs) and Kendall-tau-like
    normalization over *daily value sums* — the nonparametric "is this
    metric drifting?" check monitoring pipelines run.

    The quadratic sign-pair join operates on daily pre-aggregates, so
    pairs per type are bounded by C(days, 2) regardless of raw event
    volume, and the join key (event_type) keeps candidate generation
    co-located. Daily sums are exact integer cents; every comparison
    and the tau ratio floor are engine-identical."""
    daily = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("long").alias("v"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    sg = (
        F.when(F.col("b.v") > F.col("a.v"), 1)
        .when(F.col("b.v") < F.col("a.v"), -1)
        .otherwise(0)
    )
    s = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.day") < F.col("b.day")),
        )
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(F.sum(sg).cast("long").alias("s_stat"))
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    pairs_n = F.col("n_days") * (F.col("n_days") - 1) / 2
    return (
        n.join(s, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            F.floor(F.col("s_stat").cast("double") * 1e6 / pairs_n)
            .cast("long")
            .alias("tau_micro"),
            F.when(F.col("s_stat") > 0, "increasing")
            .when(F.col("s_stat") < 0, "decreasing")
            .otherwise("flat")
            .alias("trend"),
        )
        .orderBy("event_type")
    )
