"""Query registry: the single catalog behind ``__spark_entry__.queries()``.

Each registered query is ``(spark, sf_dir) -> DataFrame`` plus (usually)
a DuckDB oracle SQL string over the same parquet tables. Registration is
decorator-driven so adding an operator is one function + one SQL string,
and the driver contract file stays a thin re-export.

Determinism rules every query follows (SURVEY.md §5.2):
- every computed column aliased identically in Spark and SQL;
- float aggregates rounded (2dp for money sums, 4-6dp for ratios) on
  BOTH sides so double summation order can't flip the value hash;
- temporal outputs cast to strings/dates the same way on both sides;
- any LIMIT/top-k carries a total tie-break order.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]


def quantize(col: Column | str, n: int) -> Column:
    """Floor-quantization to n decimal places: ``floor(x·10ⁿ)/10ⁿ``.

    Used instead of ``round`` in every oracle-compared float output:
    round-half ties resolve differently across engines (Spark HALF_UP
    BigDecimal vs DuckDB's float rint), while floor over the *same* IEEE
    double is bit-identical everywhere. Oracle SQL mirrors it textually
    as ``floor((x) * 1eN) / 1eN``.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = float(10**n)
    return F.floor(c * s) / s


def _cents(col: Column | str, n: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * float(10**n) + F.lit(0.5)).cast("long")


def gridsum(col: Column | str, n: int) -> Column:
    """Exact, order-independent SUM of grid-decimal doubles.

    Floating sums are summation-order-dependent (ULP drift), and Spark's
    partial aggregation never orders like the oracle — so for values that
    live on a 10⁻ⁿ grid (all fixture money columns are 2dp; a product of
    two 2dp values is 4dp), recover the exact integer numerator, sum as
    BIGINT (associative, bit-exact in every engine), divide once.
    Oracle mirror: ``sum(CAST(floor(x * 1eN + 0.5) AS BIGINT)) / 1eN``.

    Test-oracle technique: BIGINT overflow bounds it to ~10¹⁸/10ⁿ of
    mass, ample at bench scale; a 100 TB production sum would use plain
    double/decimal sums where ULP drift is acceptable.
    """
    return F.sum(_cents(col, n)) / float(10**n)


def gridavg(col: Column | str, n: int) -> Column:
    """Exact AVG companion of :func:`gridsum` (null-skipping like AVG).
    Oracle mirror: ``sum(CAST(floor(x*1eN+0.5) AS BIGINT)) * 1.0 / (1eN * count(x))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_cents(c, n)) / (float(10**n) * F.count(c))

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
