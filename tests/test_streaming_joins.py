"""Streaming joins (SURVEY.md §2.3 `join_enrich_stream_static`,
`join_interval_stream`) verified by replay-equivalence: the availableNow
stream result must equal the same join expressed as a batch query over
the same fixture (SURVEY.md §5.3 self-oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import get


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_enrich_stream_static_matches_batch(spark, sf_dir):
    streamed = get("join_enrich_stream_static").fn(spark, sf_dir)

    ev = load_table(spark, "events", sf_dir)
    dim = (load_table(spark, "customer", sf_dir)
           .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    batch = (ev.join(dim, "user_id")
             .groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_events")))

    assert _rows(streamed, "c_mktsegment", "n_events") == \
           _rows(batch, "c_mktsegment", "n_events")


def test_interval_stream_join_matches_batch(spark, sf_dir):
    streamed = get("join_interval_stream").fn(spark, sf_dir)

    ev = load_table(spark, "events", sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts")))
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts")))
    batch = (clicks.join(views, F.expr(
                 "c_user = v_user AND "
                 "v_ts >= c_ts - INTERVAL 10 MINUTES AND v_ts < c_ts"))
             .groupBy("c_user")
             .agg(F.count(F.lit(1)).alias("n_pairs"),
                  F.countDistinct("click_id").alias("n_clicks")))

    got = _rows(streamed, "c_user", "n_pairs", "n_clicks")
    want = _rows(batch, "c_user", "n_pairs", "n_clicks")
    assert got == want and len(got) > 0


def test_outer_stream_stream_join_matches_batch(spark, sf_dir):
    """Every click must eventually emit — matched with its views or
    NULL-padded once the watermark proves no view can arrive. The
    batch twin is a plain left join with the same interval predicate."""
    streamed = get("join_outer_stream_stream").fn(spark, sf_dir)

    ev = load_table(spark, "events", sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts")))
    views = (ev.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("event_id").alias("view_id"),
                     F.col("ts").alias("v_ts")))
    batch = (clicks.join(views, F.expr(
                 "c_user = v_user AND "
                 "v_ts >= c_ts - INTERVAL 10 MINUTES AND v_ts < c_ts"),
                 "left_outer")
             .groupBy("c_user")
             .agg(F.countDistinct("click_id").alias("n_clicks"),
                  F.count("view_id").alias("n_pairs"),
                  F.countDistinct(
                      F.when(F.col("view_id").isNull(), F.col("click_id")))
                   .alias("n_unmatched")))

    got = _rows(streamed, "c_user", "n_clicks", "n_pairs", "n_unmatched")
    want = _rows(batch, "c_user", "n_clicks", "n_pairs", "n_unmatched")
    assert got == want and len(got) > 0
    # the outer part must be non-trivial: some click somewhere unmatched
    assert sum(r[3] for r in got) > 0
