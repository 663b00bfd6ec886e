"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export over ``projet5_spark.plans`` — the query catalog lives in
``projet5_spark/plans/{relational,events,llm}.py``, each entry a
DataFrame builder paired with its DuckDB oracle SQL
(``plans.registry``). See SURVEY.md §2 for the operator inventory these
cover.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet5_spark.plans import ORACLE, QUERIES  # noqa: E402
from projet5_spark.session import ensure_utc  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship (SURVEY.md §7.1): the composed reference-parity healthcare
    pipeline — scan → rename → full-row dedup → normalize → surrogate
    keys → first-seen admission dedup — on sf0.001."""
    ensure_utc(spark)
    return QUERIES["hc_admissions_first_seen"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_utc(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here are
    non-SQL-expressible ops (driver does a rows-only check)."""
    return dict(ORACLE)
