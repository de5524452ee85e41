"""Time-series operators over the event stream — bucket downsampling
and gap-filling, the resampling surface a real-time-analytics consumer
(/root/reference/README.md:15) runs on materialized CDC state.

Scale notes: bucketing is a pure projection + hash agg (bucket key is
computed, so the shuffle is on (bucket, type) — partial aggregation
makes the map side emit one row per bucket per task); gap-fill builds
its date spine per key with ``sequence``+``explode`` (no cross join
against a global calendar — the naive spine is |keys| × |days| rows
*before* filtering; the per-key spine materializes only each key's own
span) and forward-fills with a running ``last(ignorenulls)`` frame, one
shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.operators.aggregates import _exact_sum
from cdc_plg_spark.registry import register

BUCKET_S = 6 * 3600  # 6-hour tumbling buckets


@register(
    "ts_time_bucket",
    oracle=f"""
    SELECT CAST(floor(epoch(ts) / {BUCKET_S}) * {BUCKET_S} AS BIGINT)
               AS bucket_s,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value, 4) * 10000 AS BIGINT)) AS DOUBLE)
               / 10000 AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the event stream into 6-hour tumbling buckets per
    event type (time_bucket / date_bin semantics). Uses the native
    ``window()`` tumbling expression — the same operator the streaming
    twin (stream_tumbling_agg) uses, here in batch; Spark aligns
    windows to the unix epoch, so the bucket key is
    floor(epoch/width)*width in both engines."""
    ev = load_table(spark, "events", sf_dir)
    return (ev.groupBy(F.window("ts", f"{BUCKET_S} seconds").alias("w"),
                       "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   _exact_sum("value", scale=4).alias("sum_value"))
              .select(F.unix_timestamp("w.start").alias("bucket_s"),
                      "event_type", "n", "sum_value"))


@register(
    "ts_gap_fill",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value, 4) * 10000 AS BIGINT)) AS DOUBLE)
                   / 10000 AS day_value
        FROM events GROUP BY 1, 2),
    spine AS (
        SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi
              FROM daily GROUP BY user_id))
    SELECT s.user_id, s.d,
           LAST_VALUE(dy.day_value IGNORE NULLS) OVER (
               PARTITION BY s.user_id ORDER BY s.d) AS filled_value,
           (dy.user_id IS NOT NULL) AS is_observed
    FROM spine s LEFT JOIN daily dy ON s.user_id = dy.user_id AND s.d = dy.d
    """,
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill a per-user daily series: generate the missing calendar
    days inside each user's active span, then forward-fill the last
    observed daily total (``last(ignorenulls)`` over a running frame) —
    the standard shape for turning an irregular event stream into a
    regular time series before ML featurization."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
               .agg(_exact_sum("value", scale=4).alias("day_value")))
    spine = (daily.groupBy("user_id")
             .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
             .select("user_id",
                     F.explode(F.sequence(
                         "lo", "hi", F.expr("interval 1 day"))).alias("d")))
    joined = spine.join(daily, ["user_id", "d"], "left")
    w = (Window.partitionBy("user_id").orderBy("d")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.select(
        "user_id", "d",
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("day_value").isNotNull().alias("is_observed"))


EWMA_ALPHA = 0.3


@register(
    "ts_ewma",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value, 4) * 10000 AS BIGINT)) AS DOUBLE)
                   / 10000 AS day_value
        FROM events GROUP BY 1, 2)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(list_reduce(list(day_value ORDER BY d),
                 (acc, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * acc), 6)
               AS ewma
    FROM daily
    GROUP BY user_id
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's daily
    totals (y_i = α·x_i + (1-α)·y_{i-1}, seeded with the first
    observation — the same fold DuckDB's list_reduce performs, so the
    floating-point operation order is bit-identical in both engines).

    The fold runs as a JVM higher-order ``aggregate`` over a
    sort_array'd per-key array — no Python, one shuffle. The array is
    bounded by the key's day span, not the event count (the daily agg
    collapses first). For unbounded spans the scale path is the
    associative segment form — EWMA composes as (decay, sum) pairs:
    (d1,s1)∘(d2,s2) = (d1·d2, s1·d2 + s2) — which partial-aggregates
    like any sum; this fixture's spans don't need it."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
               .agg(_exact_sum("value", scale=4).alias("day_value")))
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("d", "day_value"))),
        lambda s: s.day_value)
    fold = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1).cast("double"),
        lambda acc, x: EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc)
    return (daily.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.round(fold, 6).alias("ewma")))


@register(
    "ts_interpolate_linear",
    oracle="""
    WITH daily AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(SUM(CAST(ROUND(value, 4) * 10000 AS BIGINT)) AS DOUBLE)
                   / 10000 AS day_value
        FROM events GROUP BY 1, 2),
    spine AS (
        SELECT user_id, UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
        FROM (SELECT user_id, MIN(d) AS lo, MAX(d) AS hi
              FROM daily GROUP BY user_id)),
    marked AS (
        SELECT s.user_id, s.d, dy.day_value,
               LAST_VALUE(dy.day_value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.d) AS prev_v,
               LAST_VALUE(CASE WHEN dy.day_value IS NOT NULL THEN s.d END
                          IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.d) AS prev_d,
               FIRST_VALUE(dy.day_value IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
               FIRST_VALUE(CASE WHEN dy.day_value IS NOT NULL THEN s.d END
                           IGNORE NULLS) OVER (
                   PARTITION BY s.user_id ORDER BY s.d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
        FROM spine s LEFT JOIN daily dy
          ON s.user_id = dy.user_id AND s.d = dy.d)
    SELECT user_id, d,
           ROUND(CASE
               WHEN day_value IS NOT NULL THEN day_value
               WHEN next_d = prev_d THEN prev_v
               ELSE prev_v + (next_v - prev_v)
                    * date_diff('day', prev_d, d)
                    / date_diff('day', prev_d, next_d)
           END, 6) AS interp_value,
           (day_value IS NOT NULL) AS is_observed
    FROM marked
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the gap-filled daily spine: missing
    days get prev + (next-prev)·(elapsed/gap) between the surrounding
    observations (forward-fill's smoother sibling — what feature
    pipelines feed to models that can't see NULLs).

    Four IGNORE-NULLS navigation windows over the SAME (user_id, d)
    ordering — Catalyst collapses them into one Window node pair
    (forward + backward frame), so the per-key sort happens once; the
    spine itself is the per-key sequence+explode from ts_gap_fill, no
    global calendar cross join."""
    ev = load_table(spark, "events", sf_dir)
    daily = (ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
               .agg(_exact_sum("value", scale=4).alias("day_value")))
    spine = (daily.groupBy("user_id")
             .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
             .select("user_id",
                     F.explode(F.sequence(
                         "lo", "hi", F.expr("interval 1 day"))).alias("d")))
    joined = spine.join(daily, ["user_id", "d"], "left")
    back = (Window.partitionBy("user_id").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = (Window.partitionBy("user_id").orderBy("d")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_d = F.when(F.col("day_value").isNotNull(), F.col("d"))
    marked = joined.select(
        "user_id", "d", "day_value",
        F.last("day_value", ignorenulls=True).over(back).alias("prev_v"),
        F.last(obs_d, ignorenulls=True).over(back).alias("prev_d"),
        F.first("day_value", ignorenulls=True).over(fwd).alias("next_v"),
        F.first(obs_d, ignorenulls=True).over(fwd).alias("next_d"))
    interp = (F.when(F.col("day_value").isNotNull(), F.col("day_value"))
              .when(F.col("next_d") == F.col("prev_d"), F.col("prev_v"))
              .otherwise(
                  F.col("prev_v") + (F.col("next_v") - F.col("prev_v"))
                  * F.datediff("d", "prev_d")
                  / F.datediff("next_d", "prev_d")))
    return marked.select(
        "user_id", "d",
        F.round(interp, 6).alias("interp_value"),
        F.col("day_value").isNotNull().alias("is_observed"))


@register(
    "ts_resample_ohlc",
    oracle="""
    WITH w AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value,
             FIRST_VALUE(value) OVER (
                 PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS open,
             LAST_VALUE(value) OVER (
                 PARTITION BY user_id, CAST(ts AS DATE)
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING) AS close
      FROM events)
    SELECT user_id, d, open,
           MAX(value) AS high, MIN(value) AS low,
           close, COUNT(*) AS n
    FROM w GROUP BY 1, 2, 3, 6
    """,
)
def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling: per (user, day) open/high/low/close — the
    financial-rollup shape of time-series downsampling.  Open/close
    are selected (not computed) values, picked by min/max over
    struct(ts, event_id, value): the unique (ts, event_id) prefix
    decides the comparison, the value field rides along, and the whole
    thing is ONE hash aggregate with map-side partials — no window, no
    sort, rows collapse to |user x day| before the only shuffle.  The
    oracle uses the window formulation instead (DuckDB's arg_min can't
    take a composite ordering key) — two plans, one answer."""
    ev = load_table(spark, "events", sf_dir)
    key = F.struct("ts", "event_id", "value")
    return (ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
            .agg(F.min(key).getField("value").alias("open"),
                 F.max("value").alias("high"),
                 F.min("value").alias("low"),
                 F.max(key).getField("value").alias("close"),
                 F.count(F.lit(1)).alias("n")))
