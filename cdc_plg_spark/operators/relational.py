"""Projection / filter / masking operators (SURVEY.md §2.2).

These realize the reference's per-event transform hooks
(/root/reference/README.md:21-24, :89 — plugins correct, filter, and
mask change events) as declarative DataFrame expressions, so Catalyst
pushes predicates into the parquet scan and prunes unread columns —
per-row plugin callbacks (the reference's WASM guest calls, README.md:87)
become whole-stage-codegen'd JVM expressions instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


@register(
    "project",
    oracle="""
    SELECT o_orderkey,
           UPPER(o_orderpriority) AS priority,
           CONCAT('order-', CAST(o_orderkey AS VARCHAR)) AS order_tag,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 0.9 AS DOUBLE) AS discounted,
           CAST(o_orderdate AS DATE) AS order_date
    FROM orders
    """,
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename + derived columns (reference: per-event
    'correction' hook, README.md:89)."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("priority"),
        F.concat(F.lit("order-"), F.col("o_orderkey").cast("string")).alias("order_tag"),
        # decimal, not double, arithmetic: exact in both engines, so the
        # oracle hash can't flap on a .xx5 rounding boundary
        (F.col("o_totalprice").cast("decimal(18,2)") * F.lit("0.9").cast("decimal(2,1)"))
        .cast("double").alias("discounted"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )


@register(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE l_linestatus = 'F'
      AND (l_returnflag IN ('R', 'A'))
      AND (l_quantity BETWEEN 5 AND 30)
      AND NOT (l_discount < 0.01)
      AND l_shipdate >= TIMESTAMP '1995-06-01'
      AND l_returnflag IS NOT NULL
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate filter (AND/OR/NOT, IN, BETWEEN, null checks) —
    the reference's event-filter plugin (README.md:89 '过滤').

    Scale: the whole conjunction reaches the parquet scan as
    PushedFilters (verified in tests/test_plans.py).
    """
    li = load_table(spark, "lineitem", sf_dir)
    return (li.filter(
                (F.col("l_linestatus") == "F")
                & F.col("l_returnflag").isin("R", "A")
                & F.col("l_quantity").between(5, 30)
                & ~(F.col("l_discount") < 0.01)
                & (F.col("l_shipdate") >= F.lit("1995-06-01").cast("timestamp"))
                & F.col("l_returnflag").isNotNull())
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
                    "l_linestatus",
                    F.col("l_shipdate").cast("date").alias("ship_date")))


@register(
    "mask_columns",
    oracle="""
    SELECT c_custkey,
           sha256(c_name) AS name_sha256,
           md5(c_mktsegment) AS segment_md5,
           regexp_replace(c_name, '[0-9]', '*', 'g') AS name_redacted,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END
               AS acctbal_public
    FROM customer
    """,
)
def mask_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensitive-field masking — the reference's data-masking plugin use
    case (README.md:24): hash, redact, and null out designated columns."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.col("c_mktsegment")).alias("segment_md5"),
        F.regexp_replace("c_name", "[0-9]", "*").alias("name_redacted"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
         .otherwise(F.round("c_acctbal", 2)).alias("acctbal_public"),
    )


@register(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'pending' END AS status_label,
           CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS size_bucket
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection (per-row correction, README.md:89)."""
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
         .when(F.col("o_orderstatus") == "O", "open")
         .otherwise("pending").alias("status_label"),
        F.when(F.col("o_totalprice") < 50000, "small")
         .when(F.col("o_totalprice") < 200000, "medium")
         .otherwise("large").alias("size_bucket"),
    )


@register(
    "reshape_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per priority × status. The
    pivot values are DECLARED (not discovered) — at 100 TB value
    discovery is an extra full scan, and an unbounded value set makes
    an unbounded schema; the declared-list form compiles to one
    partial+final conditional aggregation, same as the oracle's CASE
    form."""
    o = load_table(spark, "orders", sf_dir)
    return (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .count()
            .na.fill(0, ["F", "O", "P"]))


@register(
    "reshape_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, k AS measure, v AS value
    FROM (
        SELECT l_orderkey, l_linenumber,
               unnest(['quantity', 'extendedprice', 'discount']) AS k,
               unnest([l_quantity, l_extendedprice, l_discount]) AS v
        FROM lineitem
    )
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt (wide → long): three measure columns become
    (measure, value) rows via the native UNPIVOT generator — no join,
    no UDF, output is 3× rows but each narrow."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure", "value",
    ).withColumn("measure", F.regexp_replace("measure", "^l_", ""))
