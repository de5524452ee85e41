"""Subquery & CTE surface — the Catalyst rewrites SURVEY.md §4 lists
(RewriteCorrelatedScalarSubquery, subquery decorrelation) exercised
through the SQL entry point, plus Spark 4's recursive CTE.

Scale notes: Catalyst decorrelates each correlated subquery into a
join + aggregate (no per-row re-execution — a correlated scalar
subquery naively evaluated would be O(rows × subquery)); the plans
are ordinary joins afterwards, inheriting broadcast/AQE behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cdc_plg_spark.catalog import load_tables
from cdc_plg_spark.registry import register


@register(
    "subquery_scalar_correlated",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders o
    WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                              FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders costing more than twice the
    customer's own average. Catalyst decorrelates to (per-customer avg)
    ⋈ orders — one aggregate + one join, not per-row re-execution."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS totalprice
        FROM orders o
        WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice)
                                  FROM orders o2
                                  WHERE o2.o_custkey = o.o_custkey)
    """)


@register(
    "subquery_in",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                        WHERE l_quantity > 49)
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join after rewrite."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem
                            WHERE l_quantity > 49)
    """)


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE months(m) AS (
        SELECT 1
        UNION ALL
        SELECT m + 1 FROM months WHERE m < 12
    )
    SELECT m.m AS month,
           COUNT(o.o_orderkey) AS n_orders
    FROM months m
    LEFT JOIN orders o ON month(o.o_orderdate) = m.m
    GROUP BY m.m
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): generate the month dimension
    recursively, left-join order counts onto it — months with no orders
    still appear (the dimension-completion pattern)."""
    load_tables(spark, sf_dir)
    return spark.sql("""
        WITH RECURSIVE months(m) AS (
            SELECT 1
            UNION ALL
            SELECT m + 1 FROM months WHERE m < 12
        )
        SELECT m.m AS month,
               COUNT(o.o_orderkey) AS n_orders
        FROM months m
        LEFT JOIN orders o ON month(o.o_orderdate) = m.m
        GROUP BY m.m
    """)
