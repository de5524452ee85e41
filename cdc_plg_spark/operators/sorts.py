"""Sort / limit / top-k operators (SURVEY.md §2.6).

Ordered output mirrors the reference's ordered-stream delivery
guarantee (/root/reference/README.md:17). Scale notes: `orderBy` is a
range-partitioned distributed sort (sampled boundaries, no single-task
sort); `orderBy().limit(k)` compiles to TakeOrderedAndProject — each
partition keeps k rows, the driver merges — so global top-k never
materializes a full sort at 100 TB. Only `sort_multikey`'s global
position column requires a single-partition window tail, which is the
honest cost of a total rank and is bounded here by limit-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.functions.numeric import fast_round
from cdc_plg_spark.registry import register


@register(
    "sort_multikey",
    oracle="""
    SELECT pos, o_orderkey, o_orderpriority, ROUND(o_totalprice, 2) AS totalprice
    FROM (
        SELECT ROW_NUMBER() OVER (ORDER BY o_orderpriority ASC,
                                  o_totalprice DESC, o_orderkey ASC) AS pos,
               o_orderkey, o_orderpriority, o_totalprice
        FROM orders
    ) WHERE pos <= 1000
    """,
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key asc/desc total sort, validated through an explicit
    position column (hash comparison is order-insensitive, so the
    position is what proves the ordering)."""
    o = load_table(spark, "orders", sf_dir)
    keys = [F.asc("o_orderpriority"), F.desc("o_totalprice"), F.asc("o_orderkey")]
    top = o.orderBy(*keys).limit(1000)
    w = Window.orderBy(*keys)
    return (top.withColumn("pos", F.row_number().over(w))
               .select("pos", "o_orderkey", "o_orderpriority",
                       fast_round("o_totalprice", 2).alias("totalprice")))


@register(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders ORDER BY o_orderkey LIMIT 500
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic limit (order + limit → TakeOrderedAndProject)."""
    o = load_table(spark, "orders", sf_dir)
    return o.orderBy("o_orderkey").limit(500).select("o_orderkey", "o_orderstatus")


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k by value (per-partition heap + driver merge)."""
    o = load_table(spark, "orders", sf_dir)
    return (o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(100)
             .select("o_orderkey", "o_custkey",
                     fast_round("o_totalprice", 2).alias("totalprice")))


@register(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rk
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    ) WHERE rk <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per priority class (rank-filter; Spark pushes the
    rk<=5 predicate into the window sort as a group-limit at runtime)."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (o.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 5)
             .select("o_orderpriority", "o_orderkey",
                     fast_round("o_totalprice", 2).alias("totalprice"), "rk"))
