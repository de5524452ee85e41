"""Window-function operators (SURVEY.md §2.5).

Ordering semantics inherit the reference's core ordered-stream guarantee
(/root/reference/README.md:17 — TiCDC delivers *ordered* row-level
change data); ``dedup_latest_per_key`` is the canonical CDC→table
compaction implied by README.md:17 + README.md:64 (flush ≤ resolved-ts
implies replayable upsert state).

Scale notes: every window here partitions by a key (user_id,
l_orderkey, …) — one shuffle on the partition key, then a sort within
partitions. At 100 TB the win is that Spark's window exec spills, and
AQE handles skewed keys; we never window over an unpartitioned frame
(that would serialize the whole table through one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.functions.numeric import fast_round
from cdc_plg_spark.registry import register


@register(
    "win_row_number",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER (PARTITION BY l_orderkey
                              ORDER BY l_extendedprice DESC, l_linenumber) AS rn
    FROM lineitem
    """,
)
def win_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank line items within each order by price (deterministic tiebreak)."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber"))
    return li.select("l_orderkey", "l_linenumber",
                     F.row_number().over(w).alias("rn"))


@register(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           RANK()         OVER w AS rnk,
           DENSE_RANK()   OVER w AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS prnk,
           NTILE(4)       OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / ntile over customers per segment."""
    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_mktsegment",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_id)  OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id,
           epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-between-events per user via lag/lead."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id", "user_id",
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )


@register(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(SUM(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer spend (rowsBetween unboundedPreceding..current)."""
    o = load_table(spark, "orders", sf_dir)
    w = (Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return o.select("o_orderkey", "o_custkey",
                    fast_round(F.sum("o_totalprice").over(w), 2).alias("running_spend"))


@register(
    "win_sliding_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           COUNT(*) OVER w AS n_win,
           ROUND(SUM(o_totalprice) OVER w, 2) AS sum_win
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)
def win_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 30-day range frame per customer (rangeBetween over epoch secs)."""
    o = load_table(spark, "orders", sf_dir)
    w = (Window.partitionBy("o_custkey").orderBy(F.unix_timestamp("o_orderdate"))
         .rangeBetween(-2592000, 0))
    return o.select("o_orderkey", "o_custkey",
                    F.count(F.lit(1)).over(w).alias("n_win"),
                    fast_round(F.sum("o_totalprice").over(w), 2).alias("sum_win"))


@register(
    "win_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type)  OVER w AS last_type,
           FIRST_VALUE(event_id)   OVER w AS first_event_id,
           LAST_VALUE(event_id)    OVER w AS last_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event per user over the full partition frame."""
    ev = load_table(spark, "events", sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    return ev.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.first("event_id").over(w).alias("first_event_id"),
        F.last("event_id").over(w).alias("last_event_id"),
    ).distinct()


@register(
    "dedup_latest_per_key",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
           ROUND(value, 4) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc",),
)
def dedup_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC compaction: latest event per key by commit time.

    This is the canonical changelog→table materialization implied by the
    reference's ordered-change-stream + resolved-ts flush contract
    (/root/reference/README.md:17, :64). At scale: one hash shuffle on
    the primary key, sort within partitions, no global sort.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") == 1)
              .select("user_id", "event_id",
                      F.unix_micros("ts").alias("ts_us"),
                      "event_type",
                      fast_round("value", 4).alias("value")))


@register(
    "cdc_time_travel",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           ROUND(value, 4) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("cdc",),
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read: table state AS OF timestamp T, reconstructed
    from the changelog — restrict to events committed ≤ T, keep the
    latest per key, drop keys whose latest change was a delete
    (error→D per streaming.core.to_cdc_envelope). The reference's
    resolved-ts contract (/root/reference/README.md:64) is exactly
    what makes this well-defined: all data ≤ T has arrived.

    Same single-shuffle cost as dedup_latest_per_key, MINUS everything
    the pushed ts<=T predicate prunes at the scan — on a
    (table, date)-partitioned changelog layout the time-travel filter
    becomes partition pruning, so reading old state gets cheaper, not
    costlier, the further back T lies."""
    ev = (load_table(spark, "events", sf_dir)
          .filter(F.col("ts") <= "2024-01-15 00:00:00"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (ev.withColumn("rn", F.row_number().over(w))
              .filter((F.col("rn") == 1) & (F.col("event_type") != "error"))
              .select("user_id", "event_id",
                      F.unix_micros("ts").alias("ts_us"),
                      fast_round("value", 4).alias("value")))


@register(
    "win_cume_dist",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ROUND(CUME_DIST() OVER w, 6) AS cd,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions (cume_dist / percent_rank) per priority
    class — same single-shuffle-per-partition-key cost model as the
    ranking family."""
    o = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select("o_orderkey", "o_orderpriority",
                    F.round(F.cume_dist().over(w), 6).alias("cd"),
                    F.round(F.percent_rank().over(w), 6).alias("pr"))


@register(
    "scd2_from_cdc",
    oracle="""
    SELECT user_id, event_id, ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           ROUND(value, 4) AS value,
           (LEAD(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("cdc",),
)
def scd2_from_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history materialization from a change stream: each
    event opens a validity interval [ts, next_ts); the newest row per
    key is open-ended (is_current). The companion of
    ``dedup_latest_per_key`` — that keeps only current state, this keeps
    full history, the two tables a CDC consumer materializes from the
    reference's ordered changelog (/root/reference/README.md:17).
    At scale: identical cost to any keyed window — one shuffle on the
    key, sorted within partitions, no self-join (the naive interval
    build joins the table to itself on "next event")."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select("user_id", "event_id",
                     F.col("ts").alias("valid_from"),
                     nxt.alias("valid_to"),
                     fast_round("value", 4).alias("value"),
                     nxt.isNull().alias("is_current"))


@register(
    "win_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS last_seen,
           FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_nn,
           NTH_VALUE(v, 2 IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_nn
    FROM (SELECT *, CASE WHEN event_type = 'error' THEN NULL
                         ELSE ROUND(value, 4) END AS v
          FROM events)
    """,
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: carry-forward of the last
    non-null observation, next non-null lookahead, and positional
    nth non-null — the sensor/sparse-measurement reading of a change
    stream where some events carry no value (here: errors). Same
    single-shuffle cost as any keyed window; the three functions share
    one sort."""
    ev = load_table(spark, "events", sf_dir)
    v = F.when(F.col("event_type") == "error", None).otherwise(
        fast_round("value", 4))
    base = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ahead = base.rowsBetween(1, Window.unboundedFollowing)
    full = base.rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing)
    return (ev.withColumn("v", v)
              .select("event_id", "user_id",
                      F.last("v", ignorenulls=True).over(running)
                       .alias("last_seen"),
                      F.first("v", ignorenulls=True).over(ahead)
                       .alias("next_nn"),
                      F.nth_value("v", 2, ignoreNulls=True).over(full)
                       .alias("second_nn")))


@register(
    "win_trailing_time_range",
    oracle="""
    SELECT event_id, user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
           CAST(SUM(CAST(ROUND(value, 4) * 10000 AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 10000 AS trailing_24h
    FROM events
    """,
)
def win_trailing_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE window frame: each event's trailing-24-hour value
    total per user — RANGE BETWEEN 86400 PRECEDING on the epoch
    second, the frame whose width is measured in event time, not row
    count (rowsBetween frames break the moment event density varies;
    this is the form feature pipelines actually need). One shuffle on
    the key, one sort, exact cents inside the frame; ties at the same
    second share a frame edge identically in both engines because the
    range key is the integer second itself."""
    ev = load_table(spark, "events", sf_dir)
    ts_s = (F.unix_micros("ts") / 1_000_000).cast("long")
    cents = (F.floor(F.abs(F.col("value") * 10000) + F.lit(0.5))
             * F.signum(F.col("value"))).cast("long")
    base = ev.select("event_id", "user_id", ts_s.alias("ts_s"),
                     cents.alias("cents"))
    w = (Window.partitionBy("user_id").orderBy("ts_s")
         .rangeBetween(-86400, 0))
    return base.select(
        "event_id", "user_id", "ts_s",
        (F.sum("cents").over(w).cast("double") / 10000)
         .alias("trailing_24h"))


@register(
    "win_ntile",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: spend quartiles within each order priority.
    The order key is (totalprice, orderkey) — the unique tiebreak makes
    tile assignment deterministic across engines and partitionings."""
    o = load_table(spark, "orders", sf_dir)
    w = (Window.partitionBy("o_orderpriority")
         .orderBy("o_totalprice", "o_orderkey"))
    return (o.select("o_orderkey", "o_orderpriority",
                     F.ntile(4).over(w).alias("quartile")))
