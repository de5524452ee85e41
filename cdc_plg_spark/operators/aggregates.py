"""Aggregation operators (SURVEY.md §2.4).

All Spark aggregates here compile to partial (map-side) + final hash
aggregation automatically — one shuffle on the group key, pre-reduced
on the map side, which is the 100 TB shape.

Float discipline (FIXTURES.md oracle notes): monetary sums go through
DECIMAL(18,2/4) so both engines sum exactly and agree bit-for-bit;
the final value is cast back to DOUBLE under a stable alias. Plain
double sums are order-dependent across engines and would flap the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


def _dec(col: str, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal(18,{scale})")


@register(
    "agg_hash_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6)
               AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: sum/avg/min/max/count per
    (returnflag, linestatus)."""
    li = load_table(spark, "lineitem", sf_dir)
    sum_qty = F.sum(_dec("l_quantity"))
    return (li.groupBy("l_returnflag", "l_linestatus")
              .agg(sum_qty.cast("double").alias("sum_qty"),
                   F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                   F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                         .cast("decimal(18,4)")).cast("double").alias("sum_disc_price"),
                   F.round(sum_qty.cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
                   F.min("l_quantity").alias("min_qty"),
                   F.max("l_quantity").alias("max_qty"),
                   F.count(F.lit(1)).alias("count_order")))


@register(
    "agg_global",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
           MIN(l_shipdate) AS first_ship,
           MAX(l_shipdate) AS last_ship,
           COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (global) aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-column distinct counts (expand + two-phase agg)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
              .agg(F.countDistinct("l_suppkey").alias("n_supp"),
                   F.countDistinct("l_partkey").alias("n_part")))


@register("agg_approx_distinct", tags=("approx",))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HyperLogLog++): the 100 TB path where
    exact distinct would shuffle every key. rows-only check — sketch
    estimates differ across engines by design."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
              .agg(F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
                   F.count(F.lit(1)).alias("n_rows")))


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING_ID(l_returnflag, l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with grouping_id — subtotal + grand-total rows."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.rollup("l_returnflag", "l_linestatus")
              .agg(F.grouping_id().alias("gid"),
                   F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                   F.count(F.lit(1)).alias("n"))
              .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n"))


@register(
    "agg_collect",
    oracle="""
    SELECT l_orderkey,
           list_sort(list(l_linenumber)) AS linenumbers,
           list_sort(list(DISTINCT l_returnflag)) AS flags
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set per group (sorted for determinism)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_orderkey")
              .agg(F.sort_array(F.collect_list("l_linenumber")).alias("linenumbers"),
                   F.sort_array(F.collect_set("l_returnflag")).alias("flags")))


@register(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           arg_max(o_orderkey, o_totalprice) AS top_order,
           arg_min(o_orderkey, o_totalprice) AS bottom_order,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(MIN(o_totalprice), 2) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax per group (max_by/min_by; totalprice doubles are
    tie-free in the fixtures, keeping arg selection deterministic)."""
    o = load_table(spark, "orders", sf_dir)
    return (o.groupBy("o_orderpriority")
             .agg(F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
                  F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
                  F.round(F.max("o_totalprice"), 2).alias("max_price"),
                  F.round(F.min("o_totalprice"), 2).alias("min_price")))


@register(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
           ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev / variance / exact interpolated percentiles per group."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
              .agg(F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
                   F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
                   F.round(F.percentile("l_quantity", 0.5), 6).alias("median_qty"),
                   F.round(F.percentile("l_quantity", 0.9), 6).alias("p90_qty")))
