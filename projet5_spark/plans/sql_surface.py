"""SQL front-end surface: queries expressed as Spark SQL strings over
direct parquet table references — exercising the parser/analyzer path
(CTEs, correlated subqueries, EXISTS, LATERAL VIEW, set-op chains) that
the DataFrame modules express programmatically.

Same Catalyst plans underneath (SURVEY.md §3.4): SQL here is a second
front-end over the same engine, not a second engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query


def _tables(sf_dir: str) -> dict[str, str]:
    # single fixture inventory: sources.readers.TABLES
    from ..sources.readers import TABLES

    return {
        n: f"parquet.`{sf_dir}/{n}.parquet`"
        for n in TABLES
    }


@query(
    "sql_cte_nation_revenue_rank",
    oracle="""
    WITH rev AS (
      SELECT c_nationkey,
             sum(CAST(floor((o_totalprice) * 1e2 + 0.5) AS BIGINT)) / 1e2 AS revenue
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_nationkey),
    ranked AS (
      SELECT n_name, revenue,
             CAST(rank() OVER (ORDER BY revenue DESC, n_name) AS BIGINT) AS rk
      FROM rev JOIN nation ON n_nationkey = c_nationkey)
    SELECT n_name, revenue, rk FROM ranked WHERE rk <= 10
    """,
)
def sql_cte_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs + global window rank through the SQL parser."""
    t = _tables(sf_dir)
    return spark.sql(
        f"""
        WITH rev AS (
          SELECT c_nationkey,
                 sum(CAST(floor((o_totalprice) * 1e2 + 0.5) AS BIGINT)) / 1e2 AS revenue
          FROM {t['customer']} JOIN {t['orders']} ON o_custkey = c_custkey
          GROUP BY c_nationkey),
        ranked AS (
          SELECT n_name, revenue,
                 CAST(rank() OVER (ORDER BY revenue DESC, n_name) AS BIGINT) AS rk
          FROM rev JOIN {t['nation']} ON n_nationkey = c_nationkey)
        SELECT n_name, revenue, rk FROM ranked WHERE rk <= 10
        """
    )


@query(
    "sql_correlated_max_order",
    oracle="""
    SELECT c_custkey,
           floor(((SELECT max(o_totalprice) FROM orders WHERE o_custkey = c_custkey)) * 1e2) / 1e2
             AS max_order
    FROM customer
    """,
)
def sql_correlated_max_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into a
    left outer aggregate join; never a per-row re-execution."""
    t = _tables(sf_dir)
    return spark.sql(
        f"""
        SELECT c_custkey,
               floor(((SELECT max(o_totalprice) FROM {t['orders']} WHERE o_custkey = c_custkey)) * 1e2) / 1e2
                 AS max_order
        FROM {t['customer']}
        """
    )


@query(
    "sql_exists_recent_buyers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2001-01-01')
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def sql_exists_recent_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS + NOT EXISTS → semi-join and anti-join in one plan."""
    t = _tables(sf_dir)
    return spark.sql(
        f"""
        SELECT c_custkey, c_name
        FROM {t['customer']}
        WHERE EXISTS (SELECT 1 FROM {t['orders']}
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
          AND NOT EXISTS (SELECT 1 FROM {t['orders']}
                          WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        """
    )


@query(
    "sql_lateral_token_match",
    oracle="""
    SELECT doc_id, count(*) AS n_spark_tokens
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) t
    WHERE tok = 'spark'
    GROUP BY doc_id
    """,
)
def sql_lateral_token_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode through SQL (UDTF surface, SURVEY.md §2.6)."""
    t = _tables(sf_dir)
    return spark.sql(
        f"""
        SELECT doc_id, count(*) AS n_spark_tokens
        FROM {t['documents']}
        LATERAL VIEW explode(split(text, ' ')) x AS tok
        WHERE tok = 'spark'
        GROUP BY doc_id
        """
    )


@query(
    "sql_setop_chain_part_types",
    oracle="""
    SELECT p_partkey FROM part WHERE p_type = 'PROMO'
    UNION
    SELECT p_partkey FROM part WHERE p_size > 40
    EXCEPT
    SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    """,
)
def sql_setop_chain_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator chain with SQL's precedence rules (EXCEPT applies
    to the union result)."""
    t = _tables(sf_dir)
    return spark.sql(
        f"""
        SELECT p_partkey FROM {t['part']} WHERE p_type = 'PROMO'
        UNION
        SELECT p_partkey FROM {t['part']} WHERE p_size > 40
        EXCEPT
        SELECT p_partkey FROM {t['part']} WHERE p_brand = 'Brand#1'
        """
    )


@query(
    "sql_in_subquery_top_nations",
    oracle="""
    SELECT n_name, count(*) AS n_suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    WHERE n_regionkey IN (SELECT r_regionkey FROM region
                          WHERE r_name IN ('ASIA', 'EUROPE'))
    GROUP BY n_name
    """,
)
def sql_in_subquery_top_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _tables(sf_dir)
    return spark.sql(
        f"""
        SELECT n_name, count(*) AS n_suppliers
        FROM {t['nation']} JOIN {t['supplier']} ON s_nationkey = n_nationkey
        WHERE n_regionkey IN (SELECT r_regionkey FROM {t['region']}
                              WHERE r_name IN ('ASIA', 'EUROPE'))
        GROUP BY n_name
        """
    )
