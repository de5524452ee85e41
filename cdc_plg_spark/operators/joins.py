"""Join operators (SURVEY.md §2.3).

The reference never joins (its RFC moves single-table change events);
joins realize its real-time-analytics use case (README.md:15) and the
enrichment pattern implied by README.md:89 (plugins consult reference
data via host_call — here: a broadcast dimension join).

Scale strategy per operator:
- dimension joins broadcast explicitly (`F.broadcast`) — zero shuffle;
- fact-fact joins shuffle on the join key once and rely on AQE for
  skew-split; at 100 TB, bucketing both facts on the key removes the
  shuffle entirely (see sources/bucketing notes);
- the as-of join is linear (union + last-ignoreNulls window), never the
  quadratic candidate-pair join (kept only as the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.functions.numeric import fast_round
from cdc_plg_spark.registry import register


@register(
    "join_inner_hash",
    oracle="""
    SELECT o.o_orderkey, c.c_name, n.n_name AS nation,
           ROUND(o.o_totalprice, 2) AS totalprice
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join, dims broadcast → BroadcastHashJoin, no shuffle."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
             .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .select("o_orderkey", "c_name", F.col("n_name").alias("nation"),
                     fast_round("o_totalprice", 2).alias("totalprice")))


@register(
    "join_sortmerge",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-large equi join: merge hint forces SortMergeJoin (the 100 TB
    shape — both sides shuffle-partitioned on the key; with bucketed
    tables the exchange disappears)."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).hint("merge")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
              .select("l_orderkey", "l_linenumber", "o_orderstatus",
                      (F.col("l_extendedprice").cast("decimal(18,2)")
                       * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)")))
                      .cast("double").alias("net_price")))


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeps customers without orders (null o_orderkey)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (c.join(o, c.c_custkey == o.o_custkey, "left")
             .select("c_custkey", "o_orderkey"))


@register(
    "join_right",
    oracle="""
    SELECT p.p_partkey, l.l_orderkey, l.l_linenumber
    FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeps parts never ordered."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    return (li.join(p, li.l_partkey == p.p_partkey, "right")
              .select("p_partkey", "l_orderkey", "l_linenumber"))


@register(
    "join_full",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nationkey, sn.nationkey) AS nationkey,
           cn.n_cust, sn.n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nationkey = sn.nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-nation customer/supplier counts."""
    c = (load_table(spark, "customer", sf_dir)
         .groupBy(F.col("c_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_cust")))
    s = (load_table(spark, "supplier", sf_dir)
         .groupBy(F.col("s_nationkey").alias("nationkey"))
         .agg(F.count(F.lit(1)).alias("n_supp")))
    return (c.join(s, "nationkey", "full")
             .select(F.coalesce(c["nationkey"], s["nationkey"]).alias("nationkey"),
                     "n_cust", "n_supp"))


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (EXISTS): customers having ≥1 order."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_semi")
             .select("c_custkey", "c_name"))


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return (c.join(o, c.c_custkey == o.o_custkey, "left_anti")
             .select("c_custkey", "c_name"))


@register(
    "join_theta_range",
    oracle="""
    SELECT b.band, COUNT(o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders o
    JOIN (VALUES ('small', 0.0, 100000.0),
                 ('medium', 100000.0, 300000.0),
                 ('large', 300000.0, 1e18)) AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range-band) join against a tiny broadcast bands table.

    The bands side is broadcast → BroadcastNestedLoopJoin over 3 rows,
    which is the right plan; a large-large range join would instead get
    an equi-prefix bucket key (SURVEY.md §2.3 note).
    """
    o = load_table(spark, "orders", sf_dir)
    bands = spark.createDataFrame(
        [("small", 0.0, 100000.0), ("medium", 100000.0, 300000.0),
         ("large", 300000.0, 1e18)], "band string, lo double, hi double")
    return (o.join(F.broadcast(bands),
                   (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
             .groupBy("band")
             .agg(F.count("o_orderkey").alias("n_orders"),
                  F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                   .cast("double").alias("sum_price")))


@register(
    "join_asof",
    oracle="""
    SELECT purchase_id, user_id, ts_us, last_click_id FROM (
        SELECT p.event_id AS purchase_id, p.user_id,
               epoch_us(p.ts) AS ts_us, c.event_id AS last_click_id,
               ROW_NUMBER() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
    ) WHERE rn = 1
    """,
    tags=("cdc",),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it.

    Implemented linearly — union both sides, one window pass with
    last(..., ignorenulls) — O(n log n) in the partition instead of the
    O(clicks × purchases) candidate join the oracle uses. This is the
    state-at-time lookup pattern the reference implies for
    schema-versioned decisions (README.md:89).
    """
    ev = load_table(spark, "events", sf_dir)
    both = (ev.filter(F.col("event_type").isin("click", "purchase"))
              .select("user_id", "ts", "event_id",
                      # clicks sort before purchases at equal ts so an
                      # equal-timestamp click is visible to the purchase
                      F.when(F.col("event_type") == "click", 0).otherwise(1)
                       .alias("kind")))
    w = (Window.partitionBy("user_id").orderBy("ts", "kind", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    last_click = F.last(F.when(F.col("kind") == 0, F.col("event_id")),
                        ignorenulls=True).over(w)
    return (both.withColumn("last_click_id", last_click)
                .filter(F.col("kind") == 1)
                .select(F.col("event_id").alias("purchase_id"), "user_id",
                        F.unix_micros("ts").alias("ts_us"), "last_click_id"))
