"""Local replica of the driver's DuckDB differential-testing gate
(SURVEY.md §5.2): run each registered query on Spark AND its oracle SQL
on DuckDB over the same parquet, then compare row count, column names,
dtypes, and exact values (rows and columns order-insensitive).

Stricter than it needs to be on purpose: exact value equality after the
queries' own rounding, and exact pandas dtype equality — if this passes,
any reasonable value-hash the driver computes passes too.
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    # canonical NaN for missing values regardless of None/NaN/NaT flavor
    out = out.sort_values(by=list(out.columns), na_position="last", kind="mergesort")
    return out.reset_index(drop=True)


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        return [
            f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
        ]
    if len(sp) != len(duck_df):
        problems.append(f"{name}: row count spark={len(sp)} duck={len(duck_df)}")
    a, b = normalize(sp), normalize(duck_df)
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            problems.append(
                f"{name}.{c}: dtype spark={a[c].dtype} duck={b[c].dtype}"
            )
    if problems:
        return problems
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        problems.append(f"{name}: values differ: {str(e)[:2000]}")
    return problems
