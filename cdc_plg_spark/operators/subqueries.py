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


# ONE SQL text, two engines: written in the Spark∩DuckDB dialect
# intersection (ANSI CTEs, EXTRACT, CAST, ROUND, window SUM) and used
# verbatim as both the Spark query and the DuckDB oracle.
PORTABLE_SQL = """
    WITH rev AS (
        SELECT r.r_name AS region,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
               -- round BEFORE the BIGINT cast so the cast argument is
               -- integral: Spark truncates double->BIGINT, DuckDB rounds,
               -- and ROUND(x,4)*10000 lands on .9999... representations
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                   * 10000, 0) AS BIGINT)) AS BIGINT)
                   AS rev_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, EXTRACT(year FROM o.o_orderdate)
    )
    SELECT region, yr,
           CAST(rev_cents AS DOUBLE) / 10000 AS revenue,
           -- window-sum the BIGINTs (order-insensitive, exact), divide once:
           -- both engines see bit-identical operands
           ROUND(CAST(rev_cents AS DOUBLE)
                 / CAST(SUM(rev_cents) OVER (PARTITION BY yr) AS DOUBLE), 6)
               AS share
    FROM rev
"""


@register("sql_portable_cte", oracle=PORTABLE_SQL)
def sql_portable_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portability proof: the IDENTICAL SQL text — multi-join CTE,
    exact-cents aggregation, share-of-year window — runs unmodified on
    Spark (this query) and DuckDB (the oracle IS the same string).
    The engine's SQL surface (spark.sql over the registered fixture
    views) is ANSI enough that a user's existing warehouse query moves
    over by changing the connection string, which is the migration
    story the whole repo exists to support. Catalyst still plans it
    Spark-first: broadcasts for the dimension chain, partial+final
    agg, window over the collapsed aggregate."""
    from cdc_plg_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(PORTABLE_SQL)


@register(
    "sql_parameterized",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM orders
    WHERE o_orderdate >= DATE '1995-06-01' AND o_totalprice < 150000
    GROUP BY 1
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (`spark.sql(query, args=...)`): named markers
    bind server-side as literals AFTER parsing, so user input can never
    splice into the query text — the injection-safe surface a
    multi-tenant SQL endpoint needs, and the binding travels with the
    plan into every pushed-down scan filter."""
    from cdc_plg_spark.catalog import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS total_cents
        FROM orders
        WHERE o_orderdate >= :cutoff AND o_totalprice < :cap
        GROUP BY 1
        """,
        args={"cutoff": "1995-06-01", "cap": 150000},
    )
