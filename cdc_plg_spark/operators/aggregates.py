"""Aggregation operators (SURVEY.md §2.4).

All Spark aggregates here compile to partial (map-side) + final hash
aggregation automatically — one shuffle on the group key, pre-reduced
on the map side, which is the 100 TB shape.

Float discipline (FIXTURES.md oracle notes): monetary sums are exact
fixed-point — scale to integer units ("cents"), sum as BIGINT, divide
back through DECIMAL — so both engines agree bit-for-bit under a stable
alias. Plain double sums are order-dependent across engines and would
flap the driver's value hash. The cents path beats summing
DECIMAL(18,2) directly ~1.5x: sum(decimal(18,2)) widens to
decimal(28,2), which exceeds Spark's compact-long decimal range and
falls back to BigDecimal accumulation; sum(BIGINT) stays in codegen'd
primitive longs. Bound: the long accumulator holds ~9.2e18 integer
units — ample headroom at the 100 TB design point for scale<=4 money
columns (e.g. 1e12 rows x 1e4-unit values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


def _exact_sum(col: F.Column | str, scale: int = 2) -> F.Column:
    """Exact fixed-point sum, returned as DOUBLE.

    round(x * 10^s) -> BIGINT -> sum -> DECIMAL division by 10^s keeps
    every step exact (the source columns carry <= `scale` decimal
    digits), while the hot accumulation runs on primitive longs.
    """
    factor = 10 ** scale
    c = (F.col(col) if isinstance(col, str) else col) * factor
    # round-half-away-from-zero via floor(|x|+0.5)*sign: F.round on
    # doubles allocates a BigDecimal per value (~2x whole-agg cost);
    # floor is a primitive JVM op and stays in codegen.
    cents = (F.floor(F.abs(c) + F.lit(0.5)) * F.signum(c)).cast("long")
    total = F.sum(cents)
    return (total.cast("decimal(38,0)") / factor).cast("double")


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
    sum_qty = _exact_sum("l_quantity")
    return (li.groupBy("l_returnflag", "l_linestatus")
              .agg(sum_qty.alias("sum_qty"),
                   _exact_sum("l_extendedprice").alias("sum_base_price"),
                   _exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")),
                              scale=4).alias("sum_disc_price"),
                   F.round(sum_qty / F.count(F.lit(1)), 6).alias("avg_qty"),
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
        _exact_sum("l_extendedprice").alias("total_price"),
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
                   _exact_sum("l_quantity").alias("sum_qty"),
                   F.count(F.lit(1)).alias("n"))
              .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n"))


@register(
    "agg_collect",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list_sort(list(l_linenumber)), ',') AS linenumbers,
           array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
    FROM lineitem GROUP BY l_orderkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set per group, sorted for determinism and
    serialized to csv strings: the harness canonicalizers (driver and
    local) sort result rows via pandas, which cannot hash list cells —
    the sorted-string form carries identical information and is hashable
    on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_orderkey")
              .agg(F.array_join(
                       F.sort_array(F.collect_list("l_linenumber"))
                        .cast("array<string>"), ",").alias("linenumbers"),
                   F.array_join(F.sort_array(F.collect_set("l_returnflag")),
                                ",").alias("flags")))


@register(
    "agg_minmax_by",
    oracle="""
    SELECT o_orderpriority,
           MAX(CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
               + o_orderkey) % 10000000000 AS top_order,
           MIN(CAST(round(o_totalprice * 100) AS BIGINT) * 10000000000
               + o_orderkey) % 10000000000 AS bottom_order,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(MIN(o_totalprice), 2) AS min_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmin/argmax per group with DETERMINISTIC tie resolution that
    stays HASH-aggregatable.  Found at sf1 in the r11 scale sweep: the
    driver fixtures happen to be price-tie-free per group, but
    replicated fixtures (and any real corpus) carry ties, and the
    plain ``max_by(key, price)`` form lets each engine legally pick a
    different key.  The obvious fix — ``max_by`` over a
    ``struct(price, key)`` — is deterministic but demotes the plan
    from HashAggregate to SortAggregate (struct is not a mutable
    aggregation-buffer type), i.e. a per-partition sort the 100-TB
    plan doesn't need.  Instead we pack the composite ordering into a
    single order-preserving BIGINT: ``cents(price) * 1e10 + key``.
    Prices are cents-quantized doubles (max |price*100 -
    round(price*100)| is 3.7e-9 across all fixtures), so cents
    ordering == price ordering and both engines compute the identical
    integer; adding the key breaks ties by largest key for MAX /
    smallest for MIN, exactly the (price, key) lexicographic order.
    Domain bounds (ENFORCED contract, r12 — ADVICE r11 corrected the
    r11 docstring's bound, which was wrong by 10x): cents*1e10 + key
    < 2^63 requires cents <= 922,337,202, i.e. price < ~$9.22M (with
    orderkey < 1e10) — TPC-H sf100 tops out at ~$600k / 6e8, >15x
    headroom.  Beyond the bound non-ANSI Spark would silently WRAP
    the BIGINT and return wrong orderkeys while DuckDB errors, so the
    bound is now a per-row in-plan guard: `assert_true` costs one
    codegen comparison per row (no extra job, no plan-shape change —
    it rides the existing scan projection) and fails the query loudly
    instead of corrupting it.  The plan keeps the original
    single-Exchange partial+final HashAggregate shape; decode
    (% 1e10) is a post-agg projection of 5 rows."""
    o = load_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    guard = F.assert_true(
        cents.between(0, 922_337_202) & F.col("o_orderkey")
        .between(0, 9_999_999_999),
        F.lit("agg_minmax_by: o_totalprice/o_orderkey outside the "
              "int64-encodable domain (price < ~$9.22M, key < 1e10)"))
    enc = (cents * F.lit(10_000_000_000).cast("long")
           + F.col("o_orderkey")
           + F.coalesce(guard.cast("long"), F.lit(0)))
    return (o.groupBy("o_orderpriority")
             .agg((F.max(enc) % 10_000_000_000).alias("top_order"),
                  (F.min(enc) % 10_000_000_000).alias("bottom_order"),
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


@register("agg_approx_quantile", tags=("approx",))
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles via percentile_approx (Greenwald-Khanna
    sketch): mergeable partial sketches, one shuffle of sketch state —
    the 100 TB path, since the exact percentile (agg_stats) must
    materialize per-group sorted values. rows-only: sketch results are
    engine-specific (accuracy asserted vs the exact percentile in
    tests/test_llm_ops.py::test_approx_quantile_close_to_exact)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
            .agg(F.percentile_approx("l_extendedprice", 0.5, 10000)
                  .alias("p50_approx"),
                 F.percentile_approx("l_extendedprice", 0.99, 10000)
                  .alias("p99_approx"),
                 F.count(F.lit(1)).alias("n")))


@register(
    "agg_corr_covar",
    oracle="""
    SELECT l_returnflag,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_discount), 4) AS covar_qty_disc,
           ROUND(covar_pop(l_quantity, l_discount), 4) AS covar_pop_qty_disc
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation and sample/
    population covariance. Spark computes these as mergeable moment
    sketches (partial+final agg) — one shuffle of tiny state, never the
    raw pairs. Rounded to 4dp: both engines accumulate co-moments in
    different orders, so trailing float digits are not comparable."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 4)
                  .alias("corr_qty_price"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 4)
                  .alias("covar_qty_disc"),
                 F.round(F.covar_pop("l_quantity", "l_discount"), 4)
                  .alias("covar_pop_qty_disc")))


@register(
    "agg_mode",
    oracle="""
    SELECT l_returnflag, mode_qty, mode_n FROM (
        SELECT l_returnflag,
               ROUND(l_quantity, 2) AS mode_qty,
               COUNT(*) AS mode_n,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, l_quantity) AS rn
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode (most frequent value, smallest-value
    tie-break) per group — built as count-per-value then max_by over
    (count, value): two partial+final aggs, no window over raw rows.
    Built-in F.mode has engine-defined tie-breaking, so the explicit
    form is what a reproducible pipeline should use."""
    li = load_table(spark, "lineitem", sf_dir)
    cnt = (li.groupBy("l_returnflag", "l_quantity")
             .agg(F.count(F.lit(1)).alias("n")))
    return (cnt.groupBy("l_returnflag")
            .agg(F.max_by(F.struct(F.round("l_quantity", 2).alias("mode_qty"),
                                   F.col("n").alias("mode_n")),
                          F.struct(F.col("n"), F.negate(F.col("l_quantity"))))
                  .alias("m"))
            .select("l_returnflag", "m.mode_qty", "m.mode_n"))


@register(
    "agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           COUNT(*) AS n
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG): collect_list → array_sort
    → array_join, which keeps the concatenation deterministic under any
    partitioning — collect_list alone is arrival-ordered and therefore
    nondeterministic on a cluster. Partial+final agg; only the grouped
    strings shuffle."""
    n = load_table(spark, "nation", sf_dir)
    return (n.groupBy("n_regionkey")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                  .alias("nations"),
                 F.count(F.lit(1)).alias("n")))


@register("agg_sketch_reaggregate", tags=("approx", "sketch"))
def agg_sketch_reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct counting: per-day HyperLogLog sketches
    of active users, MERGED up to weekly estimates without touching the
    raw rows again — the pattern that makes distinct-count dashboards
    feasible at 100 TB (store tiny sketch state per partition, union
    sketches for any coarser rollup; exact countDistinct would reshuffle
    the raw keys for every new granularity). Datasketches HLL via
    hll_sketch_agg/hll_union_agg. rows-only: sketch estimates are
    engine-specific; accuracy vs exact is asserted in
    tests/test_llm_ops.py::test_hll_sketch_accuracy."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
             .agg(F.hll_sketch_agg("user_id").alias("sk"),
                  F.count(F.lit(1)).alias("n_events")))
    return (daily.groupBy(F.date_trunc("week", "day").alias("week"),
                          "event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                  .alias("approx_users"),
                 F.sum("n_events").alias("n_events"))
            .orderBy("week", "event_type"))


@register(
    "agg_bool",
    oracle="""
    SELECT event_type,
           bool_and(value > 0) AS all_pos,
           bool_or(value > 180) AS any_big,
           CAST(count_if(value > 100) AS BIGINT) AS n_over_100
    FROM events GROUP BY event_type
    """,
)
def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates (every/any/count_if) — the assertion layer of
    data-quality checks: one partial+final agg pass, boolean state only
    ever shuffles as three bits + a count per group."""
    ev = load_table(spark, "events", sf_dir)
    return (ev.groupBy("event_type")
            .agg(F.bool_and(F.col("value") > 0).alias("all_pos"),
                 F.bool_or(F.col("value") > 180).alias("any_big"),
                 F.count_if(F.col("value") > 100).alias("n_over_100")))


@register(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           ROUND(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
           ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope/intercept/r2/count) —
    OLS per group in one distributed pass: the co-moment sketches
    (sum, sum², sum of products) combine associatively, so the shuffle
    carries a handful of doubles per group regardless of row count
    (same scale story as agg_corr_covar)."""
    li = load_table(spark, "lineitem", sf_dir)
    y, x = F.col("l_extendedprice"), F.col("l_quantity")
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.regr_slope(y, x), 6).alias("slope"),
                 F.round(F.regr_intercept(y, x), 6).alias("intercept"),
                 F.round(F.regr_r2(y, x), 6).alias("r2"),
                 F.regr_count(y, x).alias("n")))


@register(
    "agg_median_mad",
    oracle="""
    WITH med AS (
        SELECT event_type, MEDIAN(value) AS med_v
        FROM events GROUP BY event_type)
    SELECT e.event_type,
           ROUND(MEDIAN(e.value), 6) AS median_value,
           ROUND(MEDIAN(ABS(e.value - m.med_v)), 6) AS mad
    FROM events e JOIN med m ON e.event_type = m.event_type
    GROUP BY e.event_type
    """,
)
def agg_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/spread per group: exact MEDIAN and the median
    absolute deviation (MAD) — the outlier-resistant twin of
    mean/stddev (agg_stats), the robust scale every data-quality
    screen should prefer when heavy tails are possible. Two passes by
    construction (MAD needs the median first); the per-group median
    relation is tiny and broadcasts back onto the fact. Exact medians
    sort within groups — at 100 TB swap to percentile_approx with a
    documented error bound; the fixture scale earns exactness."""
    ev = load_table(spark, "events", sf_dir)
    med = (ev.groupBy(F.col("event_type").alias("m_type"))
           .agg(F.median("value").alias("med_v")))
    return (ev.join(F.broadcast(med), ev.event_type == F.col("m_type"))
            .groupBy("event_type")
            .agg(F.round(F.median("value"), 6).alias("median_value"),
                 F.round(F.median(F.abs(F.col("value") - F.col("med_v"))), 6)
                  .alias("mad")))


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           GROUPING_ID(l_returnflag, l_linestatus) AS gid,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — every subset of the grouping keys in one pass (rollup's
    superset: adds the per-linestatus-only marginals).  Spark plans it
    as a single Expand + hash aggregate, so the fact is scanned once
    regardless of how many grouping sets the cube implies."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.cube("l_returnflag", "l_linestatus")
              .agg(F.grouping_id().alias("gid"),
                   _exact_sum("l_quantity").alias("sum_qty"),
                   F.count(F.lit(1)).alias("n"))
              .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n"))
