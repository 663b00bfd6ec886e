"""String scalar functions (reference R8, SURVEY.md §7.4.1).

The reference's ``normalize_name`` (migration.py:51-63) is
``str.strip().title()`` with NaN→None. Python ``str.title()`` capitalizes
after *any* non-alphabetic character (``"o'brien" → "O'Brien"``,
``"smith-jones" → "Smith-Jones"``) while Spark's ``initcap`` only
capitalizes after whitespace — so exact parity needs a custom expression.

Both variants here are **pure column expressions** (no Python UDF): they
stay JVM-side and vectorize, which is the difference between a cheap map
and a 10-100× Python round-trip at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX = 2147483640


def title_case(col: Column | str) -> Column:
    """Exact Python ``str.title()`` semantics as a native expression.

    Split the lowercased string into runs at letter/non-letter boundaries
    (zero-width Java-regex split), uppercase the first char of each
    letter-run with the higher-order ``transform``, and rejoin. All
    building blocks are Catalyst expressions — no UDF.
    """
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    parts = F.split(c, r"(?<=[^\p{L}])(?=\p{L})|(?<=\p{L})(?=[^\p{L}])")
    fixed = F.transform(
        parts,
        lambda p: F.when(
            p.rlike(r"^\p{L}"),
            F.concat(F.upper(F.substring(p, 1, 1)), F.substring(p, 2, _MAX)),
        ).otherwise(p),
    )
    return F.array_join(fixed, "")


def normalize_name(col: Column | str) -> Column:
    """R8 parity: trim + Python-title-case, NULL-preserving
    (migration.py:51-63 returns None for NaN)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(title_case(F.trim(c)))


def normalize_name_fast(col: Column | str) -> Column:
    """Spark-native variant: ``initcap(trim(col))``. Differs from the
    reference only on names with internal punctuation; preferred when
    exact ``.title()`` parity is not required (single codegen'd call)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.initcap(F.trim(c))
