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
