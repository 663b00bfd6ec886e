"""Date scalar functions (reference R9).

``parse_date`` (migration.py:65-78) is ``pd.to_datetime`` with NaN→None;
the dataset's dates are ISO ``YYYY-MM-DD`` so Spark's default
``to_date``/``to_timestamp`` parse covers them. Unparseable strings
yield NULL in both engines (pandas ``errors='coerce'`` analog).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def parse_date(col: Column | str, fmt: str | None = None) -> Column:
    """R9: string → DateType (day-granular per the ER diagram,
    SURVEY.md §7.4.5). NULL-safe via ``try_to_timestamp``: bad input →
    NULL, never an error — under Spark 4's default ANSI mode the plain
    ``to_date`` throws instead (pandas ``errors='coerce'`` parity needs
    the try_ variant)."""
    return parse_timestamp(col, fmt).cast("date")


def parse_timestamp(col: Column | str, fmt: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
