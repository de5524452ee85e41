"""Second batch of TPC-H-shaped composite plans.

Completes the classic decision-support shapes over the fixture star
schema (FIXTURES.md): late-order priority count (Q4), forecast
revenue (Q6), cross-nation trade flow (Q7), product profit (Q9),
returned-item ranking (Q10), linestatus priority mix (Q12),
order-count distribution (Q13), promotion share (Q14), top supplier
(Q15), correlated small-quantity revenue (Q17), large-volume orders
(Q18), disjunctive filters (Q19), and idle-customer audit (Q22).
Together
with analytics.py's Q3/Q5/Q8/Q21 shapes this covers every TPC-H query
pattern the fixture columns can express (no partsupp / shipmode /
phone columns — see FIXTURES.md).

Reference grounding: the RFC names real-time data analytics as its
first motivating use case (/root/reference/README.md:15); these are
the standard analytics workloads such a pipeline feeds, expressed
Spark-first: selective filters at the scans, broadcast hints only
for fixed-cardinality nation/region and scalar aggregates — customer/
supplier/part and per-key aggregates are size-gated (AQE) because they
grow with scale factor; an unconditional hint OOMs at 100 TB — for every
dimension, partial+final aggregation, window-after-agg ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.operators.aggregates import _exact_sum
from cdc_plg_spark.registry import register


@register(
    "analytics_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS yr,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                         * 10000 AS BIGINT)) AS DOUBLE) / 10000 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_1', 'NATION_2')
      AND n2.n_name IN ('NATION_1', 'NATION_2')
      AND n1.n_name <> n2.n_name
    GROUP BY 1, 2, 3
    """,
)
def analytics_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between two nations, both
    directions, by ship year.

    Two *different* roles of the same nation dimension (supplier side
    vs customer side) join as two independent fixed-size broadcast
    builds (supplier/customer themselves are size-gated) — the fact
    table is touched once and never shuffled for the dimensions; the
    only exchange is the final 4-column group-by. The nation filter is
    applied inside each broadcast build side, so the hash tables carry
    two rows each at any scale."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    nations = ("NATION_1", "NATION_2")
    n1 = (load_table(spark, "nation", sf_dir)
          .filter(F.col("n_name").isin(*nations))
          .select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (load_table(spark, "nation", sf_dir)
          .filter(F.col("n_name").isin(*nations))
          .select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("cust_nation")))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
            .filter(F.col("supp_nation") != F.col("cust_nation"))
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("yr"))
            .agg(_exact_sum(rev, scale=4).alias("revenue")))


@register(
    "analytics_product_profit",
    oracle="""
    SELECT n.n_name AS supp_nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                               - p.p_retailprice * l.l_quantity * 0.1, 4)
                         * 10000 AS BIGINT)) AS DOUBLE) / 10000 AS profit
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def analytics_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a product family by supplier nation
    and order year (retail price × qty × 0.1 stands in for supplycost
    — the fixture has no partsupp table, FIXTURES.md).

    The p_name LIKE filter lives inside the build side of `part`
    (size-gated broadcast),
    shrinking the hash table AND letting the join itself drop the
    non-matching fact rows before the aggregate — at 100 TB the
    selective dimension-join-as-filter is the whole game for Q9."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    p = (load_table(spark, "part", sf_dir)
         .filter(F.col("p_name").like("%widget%")))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("p_retailprice") * F.col("l_quantity") * 0.1)
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(p, li.l_partkey == p.p_partkey)
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy(F.col("n_name").alias("supp_nation"),
                     F.year("o_orderdate").cast("long").alias("yr"))
            .agg(_exact_sum(profit, scale=4).alias("profit")))


@register(
    "analytics_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                         * 10000 AS BIGINT)) AS DOUBLE) / 10000 AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3, 5
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def analytics_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned the most revenue in a
    half-year window — returnflag filter pushed to the lineitem scan,
    date range pushed to the orders scan, nation broadcast (customer
    size-gated),
    top-20 via TakeOrderedAndProject (no global sort materializes)."""
    li = (load_table(spark, "lineitem", sf_dir)
          .filter(F.col("l_returnflag") == "R"))
    o = (load_table(spark, "orders", sf_dir)
         .filter((F.col("o_orderdate") >= "1996-01-01")
                 & (F.col("o_orderdate") < "1996-07-01")))
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name",
                     F.col("n_name").alias("nation"),
                     F.round("c_acctbal", 2).alias("acctbal"))
            .agg(_exact_sum(rev, scale=4).alias("revenue"))
            .select("c_custkey", "c_name", "nation", "revenue", "acctbal")
            .orderBy(F.desc("revenue"), "c_custkey")
            .limit(20))


@register(
    "analytics_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '4-NOT SPECIFIED'
        GROUP BY c.c_custkey)
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
)
def analytics_order_count_distribution(spark: SparkSession,
                                       sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    zero-order customers included (that is what the LEFT join is for —
    the join predicate, not a WHERE, carries the priority filter so
    non-matching customers survive with count 0).

    Two-level aggregation: the first group-by collapses the fact to
    |customers| rows, the second to |distinct counts| — both partial+
    final, so the wide fact never crosses the wire un-aggregated."""
    c = load_table(spark, "customer", sf_dir)
    o = (load_table(spark, "orders", sf_dir)
         .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED"))
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@register(
    "analytics_promo_share",
    oracle="""
    SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS yr,
           CAST(EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS mon,
           ROUND(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                           * 10000 AS BIGINT) ELSE 0 END) AS DOUBLE)
               / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                              * 10000 AS BIGINT)) AS DOUBLE), 6)
               AS promo_share_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2
    """,
)
def analytics_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly % of revenue from PROMO parts — a
    conditional-sum ratio computed in ONE pass over the filtered fact
    (no self-join, no second scan); part joins size-gated."""
    li = (load_table(spark, "lineitem", sf_dir)
          .filter((F.col("l_shipdate") >= "1996-01-01")
                  & (F.col("l_shipdate") < "1998-01-01")))
    p = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cents = (F.floor(F.abs(rev) * 10000 + F.lit(0.5)) * F.signum(rev)
             ).cast("long")
    promo_cents = F.when(F.col("p_type") == "PROMO", cents).otherwise(F.lit(0))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .groupBy(F.year("l_shipdate").cast("long").alias("yr"),
                     F.month("l_shipdate").cast("long").alias("mon"))
            .agg(F.round(100.0 * F.sum(promo_cents).cast("double")
                         / F.sum(cents).cast("double"), 6)
                 .alias("promo_share_pct")))


@register(
    "analytics_small_qty_revenue",
    oracle="""
    WITH pa AS (
        SELECT l_partkey,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qty_c,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1)
    SELECT CAST(ROUND(
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 / 7.0, 4) AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE p.p_type = 'SMALL'
      AND 2 * pa.n * CAST(ROUND(l.l_quantity * 100) AS BIGINT) < pa.qty_c
    """,
)
def analytics_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-half-average-quantity
    orders of small parts (the correlated `l_quantity < 0.5 * AVG`
    subquery, decorrelated by hand into a per-part aggregate joined
    back on l_partkey — |parts| rows, far smaller than the fact but
    scale-growing, so size-gated rather than hint-broadcast;
    if it were not, the equi-join shuffles both sides on the same key
    and AQE picks SMJ).

    All arithmetic is fixed-point: the below-half-average predicate
    `qty < (sum/100) / (2n)` is compared as integers
    (`2*n*qty_cents < sum_cents`) and the revenue uses _exact_sum, so
    neither the filter nor the total depends on float accumulation
    order — double SUM/AVG can flip a 4-decimal rounding boundary
    between engines at larger scale factors."""
    li = load_table(spark, "lineitem", sf_dir)
    p = (load_table(spark, "part", sf_dir)
         .filter(F.col("p_type") == "SMALL"))
    qty_c = (F.floor(F.abs(F.col("l_quantity") * 100) + F.lit(0.5))
             * F.signum("l_quantity")).cast("long")
    pa = (li.groupBy(F.col("l_partkey").alias("ap_partkey"))
          .agg(F.sum(qty_c).alias("qty_c"),
               F.count(F.lit(1)).alias("n")))
    filtered = (li.join(p, li.l_partkey == p.p_partkey)
                .join(pa,
                      li.l_partkey == F.col("ap_partkey"))
                .filter(2 * F.col("n") * qty_c < F.col("qty_c")))
    return filtered.agg(
        F.round(_exact_sum("l_extendedprice") / 7.0, 4).cast("double")
         .alias("avg_yearly"))


@register(
    "analytics_idle_customers",
    oracle="""
    SELECT CAST(c.c_custkey % 7 AS BIGINT) AS cohort,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal, 2) * 100 AS BIGINT)) AS DOUBLE)
               / 100 AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM customer c2
            WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY 1
    """,
)
def analytics_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders,
    bucketed by cohort (custkey mod 7 stands in for the phone prefix —
    the fixture has no c_phone, FIXTURES.md; "recent" keeps the
    anti-join selective on a fixture where every customer has SOME
    order).

    Three-operator composition: an ungrouped scalar aggregate (the
    positive-balance mean, computed once and broadcast into the
    filter), a LEFT ANTI join against orders' o_custkey (the NOT
    EXISTS — only the join key crosses the shuffle, and at scale the
    distinct-custkey build side is far smaller than orders itself),
    and the closing small group-by."""
    c = load_table(spark, "customer", sf_dir)
    o = (load_table(spark, "orders", sf_dir)
         .filter(F.col("o_orderdate") >= "1999-01-01")
         .select("o_custkey"))
    avg_bal = (c.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    rich = (c.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal")))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    bal_cents = (F.floor(F.abs(F.round("c_acctbal", 2)) * 100 + F.lit(0.5))
                 * F.signum(F.col("c_acctbal"))).cast("long")
    return (idle.groupBy((F.col("c_custkey") % 7).cast("long").alias("cohort"))
            .agg(F.count("*").alias("numcust"),
                 (F.sum(bal_cents).cast("double") / 100).alias("totacctbal")))


@register(
    "analytics_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice, 4) * 10000 AS BIGINT))
                    AS DOUBLE)
               / CAST(SUM(CAST(ROUND(l_quantity, 4) * 10000 AS BIGINT))
                      AS DOUBLE) AS unit_price
        FROM lineitem GROUP BY 1, 2),
    best AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY l_partkey
                                     ORDER BY unit_price, l_suppkey) AS rn
        FROM ps)
    SELECT p.p_partkey, p.p_name, s.s_name AS supplier,
           n.n_name AS nation,
           CAST(FLOOR(b.unit_price * 10000 + 0.5) AS BIGINT) AS unit_price_e4
    FROM best b
    JOIN part p ON b.l_partkey = p.p_partkey
    JOIN supplier s ON b.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE b.rn = 1 AND p.p_size >= 30
    """,
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each large part, the supplier offering the
    lowest observed unit price (lineitem-derived — the fixture has no
    partsupp table, FIXTURES.md). The classic correlated-MIN-subquery
    query, decorrelated into a per-(part,supplier) aggregate + a
    per-part ranking window.

    Determinism discipline: unit price is a ratio of two exact
    fixed-point sums, so both engines derive bit-identical doubles and
    the rank can't flip on float noise; ties break on suppkey.  The
    OUTPUT is integer 1e-4 units via floor(x*1e4+0.5), not ROUND:
    Spark's round(double) goes through BigDecimal.valueOf (shortest
    decimal string) while DuckDB rounds the exact binary value, so a
    ratio whose shortest repr is a midpoint (e.g. 416.26075 for
    416.260749999...) rounds differently — floor over identical IEEE
    ops cannot diverge. At
    scale the aggregate collapses the fact to |part×supp| rows BEFORE
    the window, and the window shuffle key (partkey) matches the
    aggregate's grouping prefix."""
    li = load_table(spark, "lineitem", sf_dir)
    p = (load_table(spark, "part", sf_dir)
         .filter(F.col("p_size") >= 30))
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)

    def cents(col, scale):
        c = F.col(col) * (10 ** scale)
        return (F.floor(F.abs(c) + F.lit(0.5)) * F.signum(c)).cast("long")

    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg((F.sum(cents("l_extendedprice", 4)).cast("double")
                / F.sum(cents("l_quantity", 4)).cast("double"))
               .alias("unit_price")))
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = (ps.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1))
    return (best.join(p, best.l_partkey == p.p_partkey)
            .join(s, best.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .select("p_partkey", "p_name", F.col("s_name").alias("supplier"),
                    F.col("n_name").alias("nation"),
                    F.floor(F.col("unit_price") * 10000 + F.lit(0.5))
                     .cast("long").alias("unit_price_e4")))


@register(
    "analytics_yoy_growth",
    oracle="""
    WITH yearly AS (
        SELECT n.n_name AS nation,
               CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                             * 10000 AS BIGINT)) AS BIGINT) AS rev_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY 1, 2)
    SELECT nation, yr,
           CAST(rev_cents AS DOUBLE) / 10000 AS revenue,
           ROUND(CASE WHEN LAG(rev_cents) OVER w IS NULL THEN NULL
                 ELSE (CAST(rev_cents AS DOUBLE)
                       - CAST(LAG(rev_cents) OVER w AS DOUBLE))
                      / CAST(LAG(rev_cents) OVER w AS DOUBLE) END, 6)
               AS yoy_growth
    FROM yearly
    WINDOW w AS (PARTITION BY nation ORDER BY yr)
    """,
)
def analytics_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per supplier nation: aggregate
    the fact to |nations|×|years| rows FIRST, then a lag window over
    the tiny aggregate — the window-after-agg ordering that matters at
    scale (lagging the raw fact would sort terabytes to produce the
    same 150 rows). Exact cents keep the growth ratio bit-identical
    across engines."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cents = (F.floor(F.abs(rev) * 10000 + F.lit(0.5)) * F.signum(rev)
             ).cast("long")
    yearly = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(s, li.l_suppkey == s.s_suppkey)
              .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
              .groupBy(F.col("n_name").alias("nation"),
                       F.year("o_orderdate").cast("long").alias("yr"))
              .agg(F.sum(cents).alias("rev_cents")))
    w = Window.partitionBy("nation").orderBy("yr")
    prev = F.lag("rev_cents").over(w)
    return yearly.select(
        "nation", "yr",
        (F.col("rev_cents").cast("double") / 10000).alias("revenue"),
        F.round((F.col("rev_cents").cast("double") - prev.cast("double"))
                / prev.cast("double"), 6).alias("yoy_growth"))


@register(
    "analytics_basket_pairs",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
    SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM pairs
    GROUP BY 1, 2
    HAVING COUNT(*) >= 3
    """,
)
def analytics_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs bought together in ≥3
    orders — the association-mining primitive (and the engine's
    self-join fan-out stress shape).

    Fan-out control is the whole design: dedup to DISTINCT
    (order, part) FIRST (collapses multi-line orders before any
    pairing), then the self-equi-join on l_orderkey generates
    C(k,2) pairs per order where k is bounded by basket size — never
    corpus size; the `<` predicate halves the pair stream at the join
    itself. At 100 TB a per-order `collect_set` + array combinations
    would do the same with one shuffle fewer but loses map-side
    partial aggregation on the pair counts; the equi-join form keeps
    both sides hash-partitioned on the SAME orderkey, so AQE runs it
    without a broadcast and the pair generation is local to each
    partition."""
    items = (load_table(spark, "lineitem", sf_dir)
             .select("l_orderkey", "l_partkey").distinct())
    a = items.select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok2"),
                     F.col("l_partkey").alias("part_b"))
    return (a.join(b, (F.col("ok") == F.col("ok2"))
                   & (F.col("part_a") < F.col("part_b")))
            .groupBy("part_a", "part_b")
            .agg(F.count(F.lit(1)).alias("n_orders"))
            .filter(F.col("n_orders") >= 3))


@register(
    "analytics_priority_late_orders",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1996-01-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY 1
    """,
)
def analytics_priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders (in a one-year window) having at least
    one line shipped more than 60 days after the order date, counted
    per priority — the EXISTS-correlated-subquery pattern.

    Spark-first: the EXISTS becomes a LEFT SEMI join on l_orderkey;
    the date filter prunes the orders scan BEFORE the join, and only
    the join keys + the two dates cross the shuffle.  The ship-lag
    predicate references both sides, so it rides on the join condition
    (a semi join with a non-equi residual), not a post-filter."""
    o = (load_table(spark, "orders", sf_dir)
         .filter((F.col("o_orderdate") >= "1995-01-01")
                 & (F.col("o_orderdate") < "1996-01-01")))
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate, 60)),
        "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders")))


@register(
    "analytics_linestatus_priority_mix",
    oracle="""
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= DATE '1995-01-01'
      AND l.l_shipdate < DATE '1996-01-01'
    GROUP BY 1
    """,
)
def analytics_linestatus_priority_mix(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line status (standing in for shipmode — the
    fixture has none, FIXTURES.md), how many shipped lines belong to
    high- vs low-priority orders.  One equi-join where the fact-side
    date filter is pushed to the lineitem scan; the conditional counts
    are a single pass of partial+final aggregation."""
    li = (load_table(spark, "lineitem", sf_dir)
          .filter((F.col("l_shipdate") >= "1995-01-01")
                  & (F.col("l_shipdate") < "1996-01-01"))
          .select("l_orderkey", "l_linestatus"))
    o = load_table(spark, "orders", sf_dir).select("o_orderkey",
                                                   "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count")))


@register(
    "analytics_large_volume_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey
        FROM lineitem GROUP BY 1
        HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 20000
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(SUM(CAST(FLOOR(l.l_quantity * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS qty_e2
    FROM orders o
    JOIN big b ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4
    """,
)
def analytics_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold,
    with their customers — the classic aggregate-then-rejoin.
    Quantities aggregate in exact 1e-2 integer units.

    Scale: lineitem is scanned twice but shuffled once per scan on
    l_orderkey.  No forced broadcast of the qualifying-order set: the
    HAVING threshold keeps a FIXED FRACTION of orders, so the set
    grows linearly with SF — AQE broadcasts it while it is small
    (it sees the real post-aggregate size at runtime) and falls back
    to a shuffle join instead of OOM at a 100x scale-up (same
    discipline as the r6 Q11/Q16/Q20 hint removals)."""
    li = load_table(spark, "lineitem", sf_dir)
    qty_e2 = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(qty_e2).alias("tot"))
           .filter(F.col("tot") > 20000)
           .select("l_orderkey"))
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    return (o.join(big, o.o_orderkey == big.l_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(li.select(F.col("l_orderkey").alias("lk"), "l_quantity"),
                  F.col("o_orderkey") == F.col("lk"))
            .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
            .agg(F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
                       .cast("long")).alias("qty_e2")))


@register(
    "analytics_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_increase_e4,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def analytics_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the revenue impact of dropping small-quantity
    discounts — a pure scan-side query: three conjunctive predicates
    all pushed to the parquet scan, one global sum, no join, no
    window.  The simplest query in the suite and the purest test that
    pushdown + map-side partials work: at 100 TB it reads only the
    row groups whose min/max stats survive the predicates."""
    li = load_table(spark, "lineitem", sf_dir)
    inc = F.floor(F.col("l_extendedprice") * F.col("l_discount") * 10000
                  + F.lit(0.5)).cast("long")
    return (li.filter((F.col("l_shipdate") >= "1995-01-01")
                      & (F.col("l_shipdate") < "1996-01-01")
                      & (F.col("l_discount") >= 0.05)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.sum(inc).alias("revenue_increase_e4"),
                 F.count(F.lit(1)).alias("n_lines")))


@register(
    "analytics_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000
                              + 0.5) AS BIGINT)) AS total_e4
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_shipdate < DATE '1995-04-01'
        GROUP BY 1)
    SELECT s.s_suppkey, s.s_name, CAST(r.total_e4 AS BIGINT) AS total_e4
    FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.total_e4 = (SELECT MAX(total_e4) FROM rev)
    """,
)
def analytics_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum quarterly revenue
    — the create-view-then-correlate-against-its-MAX pattern.  The
    revenue aggregate is computed ONCE and reused for both the scalar
    MAX and the equality filter (Catalyst plans the reuse; returning
    all ties keeps the result deterministic without an arbitrary
    tiebreak, exactly as the spec query does)."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    e4 = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                 * 10000 + F.lit(0.5)).cast("long")
    rev = (li.filter((F.col("l_shipdate") >= "1995-01-01")
                     & (F.col("l_shipdate") < "1995-04-01"))
           .groupBy("l_suppkey")
           .agg(F.sum(e4).alias("total_e4")))
    top = rev.agg(F.max("total_e4").alias("m"))
    return (rev.join(F.broadcast(top), rev.total_e4 == F.col("m"))
            .join(s, rev.l_suppkey == s.s_suppkey)
            .select("s_suppkey", "s_name", "total_e4"))


@register(
    "analytics_disjunctive_filter",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                               * 10000 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_e4,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_type = 'SMALL')
       OR (p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_type = 'MEDIUM')
       OR (p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_type = 'LARGE')
    """,
)
def analytics_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: three OR-ed conjunct groups spanning both join
    sides (p_type stands in for p_container — the fixture has no
    container column, FIXTURES.md).  The optimizer test here is
    predicate DECOMPOSITION:
    Catalyst extracts the common l_quantity/p_size bounds as
    scan-level filters (CNF conversion) so both tables prune BEFORE
    the join, and the residual disjunction evaluates post-join — the
    classic case where naive planning reads everything."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    q, sz, ct = F.col("l_quantity"), F.col("p_size"), F.col("p_type")
    cond = (
        (sz.between(1, 5) & q.between(1, 11) & (ct == "SMALL"))
        | (sz.between(1, 10) & q.between(10, 20) & (ct == "MEDIUM"))
        | (sz.between(1, 15) & q.between(20, 30) & (ct == "LARGE")))
    e4 = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                 * 10000 + F.lit(0.5)).cast("long")
    return (li.join(p, li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg(F.sum(e4).alias("revenue_e4"),
                 F.count(F.lit(1)).alias("n_lines")))


@register(
    "analytics_important_stock",
    oracle="""
    WITH nval AS (
        SELECT l.l_partkey,
               SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                              * 10000 + 0.5) AS BIGINT)) AS value_e4
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY 1)
    SELECT l_partkey AS p_partkey, CAST(value_e4 AS BIGINT) AS value_e4
    FROM nval
    WHERE value_e4 * (SELECT COUNT(*) FROM nval)
          > 2 * (SELECT SUM(value_e4) FROM nval)
    """,
)
def analytics_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value held by one
    nation's suppliers, kept only where the part's share exceeds a
    fraction of the nation total — the aggregate-filtered-by-a-scalar-
    subquery-over-the-SAME-aggregate pattern.  The scalar total
    broadcasts back as a 1-row nested-loop join; the aggregate
    subtree is planned twice (plan snapshot: 6 scans — Catalyst does
    not reuse non-identical aggregate exchanges), which is the
    standard engine plan for Q11; a production pipeline at 100 TB
    would `.persist()` the per-part aggregate (group-cardinality
    sized) to make the second pass free — left un-persisted here so
    the registry query stays side-effect-free.  Value is an exact e4
    integer and the share test is integer algebra (value·n > 2·total —
    parts above TWICE the nation average; scale-free, where the
    spec's fixed 0.0001 fraction degenerates on uniform synthetic
    data),
    so no float threshold can flip a row between engines.  Adapted to
    the fixture's lineitem bridge — there is no partsupp table
    (FIXTURES.md), same adaptation as analytics_min_cost_supplier."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = (load_table(spark, "nation", sf_dir)
         .filter(F.col("n_name") == "NATION_7"))
    e4 = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                 * 10000 + F.lit(0.5)).cast("long")
    # reduce supplier to the one nation's slice BEFORE it reaches the
    # semi join — but do NOT hint the slice: 1/25 of a dimension still
    # grows LINEARLY with SF (~40M keys, hundreds of MB, at the 100-TB
    # point), so the forced broadcast OOMs exactly when the data gets
    # big (VERDICT r8 task 3, same de-hinting class as tfidf/unigram).
    # AQE broadcasts it while it is actually small and degrades to a
    # shuffled left-semi on l_suppkey at scale.  The 25-row nation
    # build stays hinted (provably bounded).
    sn = s.join(F.broadcast(n),
                F.col("s_nationkey") == F.col("n_nationkey"))
    nval = (li.join(sn.select("s_suppkey"),
                    li.l_suppkey == F.col("s_suppkey"), "left_semi")
              .groupBy(F.col("l_partkey").alias("p_partkey"))
              .agg(F.sum(e4).alias("value_e4")))
    total = nval.agg(F.sum("value_e4").alias("_t"),
                     F.count(F.lit(1)).alias("_n"))
    return (nval.join(F.broadcast(total))
                .filter(F.col("value_e4") * F.col("_n")
                        > 2 * F.col("_t"))
                .select("p_partkey", "value_e4"))


@register(
    "analytics_supplier_part_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (5, 10, 15, 20, 25, 30)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def analytics_supplier_part_variety(spark: SparkSession,
                                    sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): how many
    DISTINCT suppliers can provide each (brand, type, size) bucket,
    excluding blacklisted suppliers — the NOT-IN-subquery → anti-join
    rewrite plus a grouped count-distinct; the count-distinct expands
    to (keys, suppkey) distinct then counts.  No broadcast hint on
    EITHER build side: the size-IN filter keeps ~12% of part and the
    negative-balance blacklist a fixed fraction of supplier — both
    grow linearly with SF, so a forced hint OOMs at a 100x scale-up.
    AQE broadcasts each while it is actually small and degrades to
    shuffle joins otherwise (same discipline as the r6 Q11/Q20 hint
    removals)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = (load_table(spark, "part", sf_dir)
         .filter((F.col("p_brand") != "Brand#13")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(5, 10, 15, 20, 25, 30)))
    bad = (load_table(spark, "supplier", sf_dir)
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
              .join(p, li.l_partkey == p.p_partkey)
              .groupBy("p_brand", "p_type", "p_size")
              .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register(
    "analytics_restock_candidates",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
        HAVING COUNT(*) >= 2
           AND SUM(CASE WHEN l_shipdate >= DATE '1995-01-01'
                         AND l_shipdate < DATE '1996-01-01'
                        THEN CAST(ROUND(l_quantity, 4) * 10000 AS BIGINT)
                        ELSE 0 END) * 2
               > SUM(CAST(ROUND(l_quantity, 4) * 10000 AS BIGINT)))
    """,
)
def analytics_restock_candidates(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers who moved
    MORE than half of a flagged part's lifetime volume inside one year
    — the nested IN-chain (supplier ← pairs ← flagged parts) with a
    correlated volume threshold.  The spec's availqty>0.5×shipped
    test becomes a conditional-sum HAVING over the SAME pair
    aggregate (no second scan, exact e4 integers, integer doubling
    instead of a 0.5 float; a 2-line floor keeps single-shipment
    pairs — trivially "all volume in one year" — from qualifying
    every supplier on sparse fixtures).  Plan: flagged part ids broadcast-semi
    onto the fact, ONE (supp, part) aggregate, then the surviving
    suppkeys broadcast-semi onto supplier — no subquery is ever
    re-evaluated per row, which is the entire point of decorrelating
    Q20."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    flagged = (load_table(spark, "part", sf_dir)
               .filter(F.col("p_name").startswith("small"))
               .select("p_partkey"))
    q_e4 = F.round(F.col("l_quantity"), 4).cast("decimal(18,4)") \
            .cast("double") * 10000
    q_e4 = q_e4.cast("long")
    in95 = (F.col("l_shipdate") >= "1995-01-01") & \
           (F.col("l_shipdate") < "1996-01-01")
    # flagged ids are a name-prefix slice of part (~1/6, scales with
    # SF) — no forced broadcast; AQE demotes to shuffle semi join
    # when the slice outgrows the threshold
    pairs = (li.join(flagged,
                     li.l_partkey == F.col("p_partkey"), "left_semi")
               .groupBy("l_suppkey", "l_partkey")
               .agg(F.sum(F.when(in95, q_e4).otherwise(0)).alias("_y"),
                    F.sum(q_e4).alias("_all"),
                    F.count(F.lit(1)).alias("_n"))
               .filter((F.col("_n") >= 2)
                       & (F.col("_y") * 2 > F.col("_all")))
               .select("l_suppkey").distinct())
    # qualifying suppliers are a fixed fraction of a growing dimension
    # too — no hint here either; AQE sees the real post-aggregate size
    return (s.join(pairs, s.s_suppkey == pairs.l_suppkey, "left_semi")
             .select("s_suppkey", "s_name"))
