"""Vector expressions over ``array<float>`` embedding columns.

All higher-order-function compositions (``zip_with`` + ``aggregate``) —
they run as Catalyst expressions on the JVM, so similarity search plans
stay shuffle-only-where-needed and never cross into Python. At 100 TB
this is the difference between an expression pipeline and an Arrow
round-trip per batch. (A pandas-UDF variant would be the fallback if the
math outgrew expression form — it hasn't.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (double accumulator)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    s = F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return F.sqrt(s)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a||b|); NULL when either norm is 0."""
    d = dot(a, b)
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb))
