"""Engine-invariant transcendental helpers.

JVM ``Math.log`` (≤1 ulp) and libm-based engines (~0.5 ulp) are not
bit-identical, so any gridded score built on an engine's own ``ln`` can
flip a floor boundary cross-engine. These helpers evaluate a *fixed*
IEEE-754 expression instead — every op a single add/mul/div, so any
IEEE-conformant engine produces identical bits:

  ln(k) for integer k ≥ 1:  range-reduce k = m·2^e with e from the
  integer's bit length (exact, no transcendental), m ∈ [1,2); then
  ln(m) = 2·atanh(z), z = (m-1)/(m+1) ∈ [0,1/3), as a 6-term Horner
  polynomial. Max truncation error vs true ln ≈ 1e-7 relative —
  ranking- and quality-score-grade, not libm-grade.

The Spark column builder and the SQL-text builder emit the SAME
expression tree; keep them in lockstep when editing. The table form for
count-keyed lookups lives in ``plans.curation._ln_det_table``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ln(2) as the shortest decimal round-tripping to the nearest double;
#: both engines' literal parsers round-to-nearest, so they agree bitwise.
LN2 = "0.6931471805599453"


def _ln_det_int_spark_sql(name: str) -> str:
    """The Spark-SQL text of :func:`ln_det_int` — the same expression
    tree as the old Column-API builder (D-suffixed double literals via
    repr(), which round-trips each coefficient to the identical
    nearest double Spark's literal parser produces)."""
    e = f"(length(bin({name})) - 1)"
    m = (
        f"(cast({name} as double) / "
        f"cast(shiftleft(cast(1 as bigint), {e}) as double))"
    )
    z = f"(({m} - 1.0D) / ({m} + 1.0D))"
    z2 = f"({z} * {z})"
    horner = (
        f"(1.0D + {z2} * ({1.0 / 3.0!r}D + {z2} * ({1.0 / 5.0!r}D + {z2} * "
        f"({1.0 / 7.0!r}D + {z2} * ({1.0 / 9.0!r}D + {z2} * "
        f"{1.0 / 11.0!r}D)))))"
    )
    lnm = f"(2.0D * ({z} * {horner}))"
    return f"(cast({e} as double) * {LN2}D + {lnm})"


def ln_det_int(name: str) -> Column:
    """Deterministic ln over the positive-integer column ``name``
    (Spark side). Takes a column *name*, not an expression, so the
    bit-length range reduction can reference it textually; materialize
    composite inputs with ``withColumn`` first.

    Mirrors :func:`ln_det_int_sql` op for op; whole-stage codegen's
    subexpression elimination handles the repeated ``z2`` terms.
    Composed as ONE F.expr (r13): the Column-API tree issued ~100 py4j
    round-trips per call site at plan-build time — ~50 call sites
    across the catalog paid it per invocation."""
    return F.expr(_ln_det_int_spark_sql(name))


def ln_det_int_sql(k: str) -> str:
    """Deterministic ln over a positive-integer SQL expression ``k``
    (DuckDB side) — the textual twin of :func:`ln_det_int`.

    DuckDB spells the bit-length trick ``printf('%b', k)`` and ``<<``;
    the arithmetic tree after range reduction is identical."""
    e = f"(length(printf('%b', {k})) - 1)"
    m = f"(CAST({k} AS DOUBLE) / CAST((CAST(1 AS BIGINT) << {e}) AS DOUBLE))"
    z = f"(({m} - 1.0) / ({m} + 1.0))"
    z2 = f"({z} * {z})"
    horner = (
        f"(1.0 + {z2} * (1.0/3.0 + {z2} * (1.0/5.0 + {z2} * "
        f"(1.0/7.0 + {z2} * (1.0/9.0 + {z2} * (1.0/11.0))))))"
    )
    lnm = f"(2.0 * ({z} * {horner}))"
    return f"(CAST({e} AS DOUBLE) * {LN2} + {lnm})"
