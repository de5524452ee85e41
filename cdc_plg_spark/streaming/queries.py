"""Streaming operators (SURVEY.md §2.9), registry-wired.

Each query runs its stream to completion with trigger(availableNow)
over the static events fixture (deterministic replay, SURVEY.md §5.3)
and returns the materialized result, so the driver's harness can hash
it like any batch query. Where the final state is SQL-expressible the
oracle is real DuckDB SQL (tumbling/sliding buckets, gaps-and-islands
sessions, distinct-dedup); multi-batch behaviors (watermark eviction,
checkpoint restart) are exercised in tests/test_streaming.py.

Watermarks ARE the reference's resolved-ts contract (README.md:64):
"all events ≤ T have arrived" drives state finalization exactly as
FlushRowChangedEvents(resolvedTs) drives sink flush.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.registry import register
from cdc_plg_spark.streaming.core import read_events_stream, run_to_table


@register(
    "stream_tumbling_agg",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 600) * 600) AS TIMESTAMP)
               AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 10-minute windows per event_type. State is keyed on
    (window, event_type); the watermark bounds state size — without it
    a 100 TB stream would accrete windows forever."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (ev.groupBy(F.window("ts", "10 minutes"), "event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("value").cast("decimal(18,4)"))
                   .cast("double").alias("sum_value")))
    out = run_to_table(agg, output_mode="complete")
    return out.select(F.col("window.start").alias("window_start"),
                      "event_type", "n", "sum_value")


@register(
    "stream_sliding_agg",
    oracle="""
    WITH offs AS (SELECT unnest([0, 1]) AS k)
    SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300 - k * 300)
                AS TIMESTAMP) AS window_start,
           COUNT(*) AS n
    FROM events CROSS JOIN offs
    WHERE epoch(ts) < floor(epoch(ts) / 300) * 300 - k * 300 + 600
    GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_sliding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min length, 5 min slide): each event lands in
    two overlapping windows; the oracle reproduces the window algebra
    with an explicit offset unnest."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
             .agg(F.count(F.lit(1)).alias("n")))
    out = run_to_table(agg, output_mode="complete")
    return out.select(F.col("window.start").alias("window_start"), "n")


@register(
    "stream_session_window",
    oracle="""
    WITH marked AS (
        SELECT user_id, ts,
               CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("streaming",),
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) per user — Spark's
    session_window merges adjacent state at watermark advance; the
    oracle is the classic batch gaps-and-islands rewrite."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    agg = (ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
             .agg(F.count(F.lit(1)).alias("n_events")))
    out = run_to_table(agg, output_mode="complete")
    return out.select("user_id",
                      F.col("session_window.start").alias("session_start"),
                      "n_events")


@register(
    "stream_watermark_late",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 3600) * 3600) AS TIMESTAMP)
               AS window_start,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_watermark_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly counts under a 30-minute watermark. In a single
    availableNow replay nothing is late, so the result equals the batch
    query — the multi-batch eviction behavior (late rows beyond the
    watermark dropped, state freed) is asserted separately in
    tests/test_streaming.py::test_watermark_drops_late_data."""
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
    agg = (ev.groupBy(F.window("ts", "1 hour"))
             .agg(F.count(F.lit(1)).alias("n")))
    out = run_to_table(agg, output_mode="complete")
    return out.select(F.col("window.start").alias("window_start"), "n")


@register(
    "stream_dedup",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming",),
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once event dedup by id (README.md:119's idempotence):
    the same source is read twice and unioned — every event arrives
    twice — and dropDuplicates on event_id restores the original set.
    State is one key per event_id, bounded by the watermark in the
    `dropDuplicatesWithinWatermark` variant."""
    a = read_events_stream(spark, sf_dir)
    b = read_events_stream(spark, sf_dir)
    deduped = (a.unionByName(b)
                .dropDuplicates(["event_id"])
                .select("event_id", "user_id", "event_type"))
    return run_to_table(deduped, output_mode="append")


@register(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, user_id, event_type FROM events
    """,
    tags=("streaming",),
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-BOUNDED dedup via dropDuplicatesWithinWatermark
    (Spark 3.5+): unlike plain dropDuplicates, whose per-key state
    grows forever, each key's state is evicted once the watermark
    passes its event time — the only dedup that survives an unbounded
    100 TB/day CDC stream.  Same doubled-source setup as stream_dedup:
    the source is read twice and unioned, so every event arrives
    twice with identical event time; the dedup restores the original
    set, which is exactly what the batch oracle states."""
    a = read_events_stream(spark, sf_dir)
    b = read_events_stream(spark, sf_dir)
    deduped = (a.unionByName(b)
                .withWatermark("ts", "1 hour")
                .dropDuplicatesWithinWatermark(["event_id"])
                .select("event_id", "user_id", "event_type"))
    return run_to_table(deduped, output_mode="append")


@register(
    "stream_stateful_custom",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
    tags=("streaming",),
)
def stream_stateful_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary per-key state via applyInPandasWithState — the Spark
    replacement for the reference's stateful plugin hook (README.md:89,
    plugins keep their own state between events). Maintains a running
    (count, sum) per user; emits the updated state each batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 4)]})

    ev = read_events_stream(spark, sf_dir)
    result = (ev.groupBy("user_id")
                .applyInPandasWithState(
                    track,
                    outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
                    stateStructType="n BIGINT, total DOUBLE",
                    outputMode="update",
                    timeoutConf=GroupStateTimeout.NoTimeout))
    out = run_to_table(result, output_mode="update")
    # update mode emits one row per key per batch; keep the final state
    return (out.groupBy("user_id")
               .agg(F.max("n_events").alias("n_events"),
                    F.round(F.max("total_value"), 4).alias("total_value")))


@register("stream_checkpoint", tags=("streaming",))
def stream_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed foreachBatch sink — the checkpoint-ts / 2PC-restart
    contract (README.md:65, :99-119): micro-batches land exactly-once
    keyed by epoch id; restart-resumes-from-commit-log is asserted in
    tests/test_streaming.py::test_checkpoint_restart_no_reprocess.
    rows-only: epoch assignment isn't SQL-expressible."""
    import tempfile

    from cdc_plg_spark.streaming.core import run_foreach_batch

    out_dir = tempfile.mkdtemp(prefix="cdc_sink_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        # idempotent apply: the epoch id keys the write (README.md:119)
        (df.withColumn("epoch_id", F.lit(epoch_id))
           .write.mode("append").parquet(out_dir))

    ev = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts")
    run_foreach_batch(ev, write_batch, ckpt)
    return spark.read.parquet(out_dir).select("event_id", "user_id", "epoch_id")


@register(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span_us
    FROM events GROUP BY user_id
    """,
    tags=("streaming",),
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key state via transformWithStateInPandas (Spark 4's successor
    to applyInPandasWithState, with typed state variables and timers) —
    tracks per-user event count and first/last timestamps. Falls back to
    an applyInPandasWithState implementation of the same computation
    when the API (or its python-protobuf wire dependency) is
    unavailable, so the operator degrades instead of breaking."""
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor, StatefulProcessorHandle)
        from google.protobuf import descriptor  # noqa: F401 - TWS wire dep
    except ImportError:  # pragma: no cover - Spark < 4.0 / no protobuf
        return _span_via_apply_in_pandas_with_state(spark, sf_dir)

    class SpanTracker(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "span", "n BIGINT, first_us BIGINT, last_us BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            # exact integer µs (pandas datetime64[ns] int view // 1000):
            # a float seconds epoch would drift vs the oracle hash
            n, first_us, last_us = 0, None, None
            if self._state.exists():
                n, first_us, last_us = self._state.get()
            for pdf in rows:
                us = (pdf["ts"].astype("int64") // 1_000)
                n += len(pdf)
                lo, hi = int(us.min()), int(us.max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = hi if last_us is None else max(last_us, hi)
            self._state.update((n, first_us, last_us))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "span_us": [last_us - first_us]})

        def close(self) -> None:
            pass

    ev = read_events_stream(spark, sf_dir)
    result = (ev.groupBy("user_id")
              .transformWithStateInPandas(
                  SpanTracker(),
                  outputStructType="user_id BIGINT, n_events BIGINT, span_us BIGINT",
                  outputMode="Update",
                  timeMode="None"))
    out = run_to_table(result, output_mode="update")
    return (out.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("span_us").alias("span_us")))


def _span_via_apply_in_pandas_with_state(spark: SparkSession,
                                         sf_dir: str) -> DataFrame:
    """Fallback engine for stream_transform_with_state: identical
    per-user (count, time-span) state kept through the older
    applyInPandasWithState API."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def track(key, pdf_iter, state: GroupState):
        if state.exists:
            n, first_us, last_us = state.get
        else:
            n, first_us, last_us = 0, None, None
        for pdf in pdf_iter:
            us = pdf["ts"].astype("int64") // 1_000
            n += len(pdf)
            lo, hi = int(us.min()), int(us.max())
            first_us = lo if first_us is None else min(first_us, lo)
            last_us = hi if last_us is None else max(last_us, hi)
        state.update((n, first_us, last_us))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "span_us": [last_us - first_us]})

    ev = read_events_stream(spark, sf_dir)
    result = (ev.groupBy("user_id")
              .applyInPandasWithState(
                  track,
                  outputStructType="user_id BIGINT, n_events BIGINT, span_us BIGINT",
                  stateStructType="n BIGINT, first_us BIGINT, last_us BIGINT",
                  outputMode="update",
                  timeoutConf=GroupStateTimeout.NoTimeout))
    out = run_to_table(result, output_mode="update")
    return (out.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("span_us").alias("span_us")))


def _ensure_event_chunks(spark: SparkSession, sf_dir: str) -> str:
    """Re-chunk the events fixture into 3 explicit parquet files (one
    per event_id%3 value) so availableNow + maxFilesPerTrigger=1
    genuinely exercises the multi-batch path — fixtures are single
    files = single batch otherwise. One explicit file per chunk id:
    repartitionByRange samples its boundaries, and with only 3 distinct
    keys a sampling round can coalesce two keys into one partition
    (observed live) — the multi-batch guarantee must not depend on
    sampler luck. Build in scratch + atomic rename so a crash never
    publishes a partial layout (same discipline as
    staged_events_stream)."""
    import os as _os
    import shutil as _sh

    from cdc_plg_spark.catalog import cache_dir, load_table

    chunks = cache_dir("upsert_chunks", sf_dir)
    if not _os.path.isdir(chunks):
        build = chunks + ".build"
        _sh.rmtree(build, ignore_errors=True)
        _os.makedirs(build)
        ev = (load_table(spark, "events", sf_dir)
              .select("event_id", "ts", "user_id", "event_type", "value"))
        for i in range(3):
            tmp = _os.path.join(build, f"_b{i}")
            (ev.filter(F.col("event_id") % 3 == i)
               .coalesce(1).write.mode("overwrite").parquet(tmp))
            part = next(f for f in _os.listdir(tmp)
                        if f.endswith(".parquet") and not f.startswith("."))
            _os.replace(_os.path.join(tmp, part),
                        _os.path.join(build, f"chunk{i}.parquet"))
            _sh.rmtree(tmp)
        try:
            _os.rename(build, chunks)
        except OSError:
            _sh.rmtree(build, ignore_errors=True)  # concurrent builder won
    return chunks


@register(
    "stream_ddl_additive_evolve",
    oracle="""
    WITH ddl AS (
        SELECT MIN(epoch_us(ts))
               + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS at_us
        FROM events)
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
           ROUND(value, 4) AS value,
           CASE WHEN epoch_us(ts) >= ddl.at_us
                THEN ROUND(value * 0.9, 4) END AS value_eur,
           CAST(CASE WHEN epoch_us(ts) >= ddl.at_us THEN 2 ELSE 1 END
                AS INT) AS schema_version
    FROM events, ddl
    """,
    tags=("streaming", "cdc", "ddl"),
)
def stream_ddl_additive_evolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive DDL applied MID-STREAM, without a query restart — the
    last honest gap vs the reference's per-event DDL interleave
    (README.md:57,:63 EmitDDLEvent; §3.2 handles incompatible DDL via
    controlled restart, this query proves the additive case needs none).

    Flow: schema v1 (the base event shape) and v2 (adds a derived
    `value_eur` column) are registered in the schema-registry table
    with v2 effective at the midpoint of event time — the DDL event.
    A 3-batch stream runs ONCE under foreachBatch; each batch consults
    the registry (the host_call pattern, README.md:89) and splits its
    rows at the effective timestamp: pre-DDL rows are written in the
    v1 shape, post-DDL rows in the wider v2 shape WITH the new column
    populated — so a straddling batch emits both shapes, exactly the
    interleaved semantics. The sink directory therefore accumulates
    heterogeneous-schema parquet within one run; mergeSchema
    (union-by-name) unifies on read with NULL for the column's pre-DDL
    history. The oracle replays the same split in SQL, and
    `schema_version` carrying both 1 and 2 in one result proves rows
    before AND after the DDL landed in a single uninterrupted run.

    Scale: the per-batch work is a filter + projection (narrow, no
    shuffle); registry lookup is a model-sized read per batch. At
    100 TB the sink is a lakehouse table whose ADD COLUMN is a
    metadata-only operation — union-by-name parquet is the same
    semantics without the table format."""
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.streaming.core import run_foreach_batch
    from cdc_plg_spark.streaming.schema_registry import (
        REGISTRY_SCHEMA, register_schema)

    chunks = _ensure_event_chunks(spark, sf_dir)

    ev = load_table(spark, "events", sf_dir)
    lo, hi = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).collect()[0]
    ddl_us = lo + (hi - lo) // 2  # scalar: the DDL event's effective ts

    base = _tf.mkdtemp(prefix="cdc_ddl_evolve_")
    registry_path = _os.path.join(base, "registry")
    sink_path = _os.path.join(base, "sink")
    ckpt = _os.path.join(base, "ckpt")
    v1 = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
          "event_type STRING, value DOUBLE")
    register_schema(spark, registry_path, "events", v1,
                    "1970-01-01T00:00:00+00:00", version=1)
    register_schema(
        spark, registry_path, "events", v1 + ", value_eur DOUBLE",
        pd.Timestamp(ddl_us, unit="us", tz="UTC").to_pydatetime(),
        version=2)

    def evolve_batch(batch_df: DataFrame, epoch_id: int) -> None:
        sess = batch_df.sparkSession
        # host_call: latest schema version in force (model-sized
        # registry read per batch). unix_micros keeps the boundary in
        # Spark, avoiding driver-local-timezone datetime conversion.
        boundary_us = (
            sess.read.schema(REGISTRY_SCHEMA).parquet(registry_path)
            .filter(F.col("table") == "events")
            .agg(F.max_by(F.unix_micros("effective_ts"), F.col("version")))
            .collect()[0][0])
        pre = batch_df.filter(F.unix_micros("ts") < boundary_us)
        post = batch_df.filter(F.unix_micros("ts") >= boundary_us)
        # v1 shape for pre-DDL rows; wider v2 shape (new column
        # populated) for post-DDL rows — one run, two file schemas.
        if not pre.isEmpty():
            pre.write.mode("append").parquet(sink_path)
        if not post.isEmpty():
            (post.withColumn("value_eur", F.round(F.col("value") * 0.9, 4))
             .write.mode("append").parquet(sink_path))

    stream = (spark.readStream
              .schema(v1)
              .option("maxFilesPerTrigger", 1)
              .parquet(chunks))
    run_foreach_batch(stream, evolve_batch, ckpt)

    merged = spark.read.option("mergeSchema", "true").parquet(sink_path)
    return merged.select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", F.round("value", 4).alias("value"),
        F.round("value_eur", 4).alias("value_eur"),
        F.when(F.col("value_eur").isNotNull(), F.lit(2))
         .otherwise(F.lit(1)).cast("int").alias("schema_version"))


@register(
    "stream_foreachbatch_upsert",
    oracle="""
    SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type,
           ROUND(value, 4) AS value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("streaming", "cdc"),
)
def stream_foreachbatch_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full CDC sink loop: a multi-batch stream upserted into a
    keyed materialized table by a ``foreachBatch`` MERGE — compact each
    micro-batch to latest-per-key, full-outer-merge it into the running
    state keeping the (ts, event_id)-max row per key, write the new
    state version keyed by epoch (idempotent re-apply, README.md:119).
    The merge is associative + commutative, so the final state is
    batch-order-independent and equals the global latest-per-key
    compaction — which is exactly what the SQL oracle checks. In
    production the state table is Delta/Iceberg MERGE INTO; the
    dataflow per batch — shuffle both sides on the pk, keep max — is
    identical. Events are re-chunked into 3 files (range-partitioned
    on the chunk id, so each of the 3 chunk values lands in its own
    non-empty file — hash repartition can collide values into fewer)
    so availableNow genuinely exercises the multi-batch path (fixtures
    are single files = single batch otherwise).
    """
    import os as _os
    import shutil as _sh
    import tempfile as _tf

    from cdc_plg_spark.catalog import cache_dir
    from cdc_plg_spark.streaming.core import run_foreach_batch

    chunks = _ensure_event_chunks(spark, sf_dir)

    # state versions live under the sf-keyed cache (CACHE_VERSION governs
    # cleanup); the checkpoint is per-run scratch, removed in `finally` —
    # mkdtemp without cleanup leaked a directory pair per invocation.
    state_base = cache_dir("upsert_state", sf_dir)
    _os.makedirs(state_base, exist_ok=True)
    ckpt = _tf.mkdtemp(prefix="cdc_upsert_ckpt_")
    current: dict[str, str] = {"path": ""}

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        newest = (batch_df
                  .withColumn("_r", F.row_number().over(
                      W.partitionBy("user_id")
                       .orderBy(F.desc("ts"), F.desc("event_id"))))
                  .filter(F.col("_r") == 1).drop("_r"))
        if current["path"]:
            prev = batch_df.sparkSession.read.parquet(current["path"])
            newest = (prev.unionByName(newest)
                      .withColumn("_r", F.row_number().over(
                          W.partitionBy("user_id")
                           .orderBy(F.desc("ts"), F.desc("event_id"))))
                      .filter(F.col("_r") == 1).drop("_r"))
        out = _os.path.join(state_base, f"state_{epoch_id}")
        newest.write.mode("overwrite").parquet(out)
        current["path"] = out

    from pyspark.sql import Window as W

    stream = (spark.readStream
              .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                      "event_type STRING, value DOUBLE")
              .option("maxFilesPerTrigger", 1)
              .parquet(chunks))
    try:
        run_foreach_batch(stream, merge_batch, ckpt)
    finally:
        _sh.rmtree(ckpt, ignore_errors=True)

    final = spark.read.parquet(current["path"])
    return final.select("user_id", "event_id",
                        F.unix_micros("ts").alias("ts_us"),
                        "event_type",
                        F.round("value", 4).alias("value"))


@register(
    "stream_join_then_window",
    oracle="""
    WITH clicks AS (
        SELECT user_id AS cu, event_id AS cid, ts AS cts
        FROM events WHERE event_type = 'click'),
    views AS (
        SELECT user_id AS vu, event_id AS vid, ts AS vts
        FROM events WHERE event_type = 'view')
    SELECT CAST(to_timestamp(floor(epoch(c.cts) / 86400) * 86400)
               AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_pairs,
           CAST(MIN(c.cid) AS BIGINT) AS min_click,
           CAST(MAX(v.vid) AS BIGINT) AS max_view
    FROM clicks c JOIN views v
      ON c.cu = v.vu
     AND v.vts >= c.cts - INTERVAL 10 MINUTE AND v.vts < c.cts
    GROUP BY 1
    """,
    tags=("streaming",),
)
def stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query: a
    stream-stream interval join whose output feeds a daily tumbling
    window aggregate, both in append mode — the shape Spark could not
    run before 3.4 (multiple stateful operators) and the reason the
    engine can express "join two changefeeds, then roll up" as ONE
    standing query instead of a join query materializing into a
    second aggregation query.

    Each operator keeps its own watermark-bounded state (join: both
    input sides inside the interval; agg: open windows); the window
    only finalizes once the propagated watermark — input watermark
    minus the join's interval slack — passes its end, so emission is
    exactly-once per window. The sentinel-staged source provides the
    multi-batch watermark advances replay needs; sentinel rows join
    nothing (equal timestamps fail the strict v_ts < c_ts bound).
    No DISTINCT aggregates: streaming append mode forbids them, so
    the window carries count + min/max instead."""
    from cdc_plg_spark.streaming.core import staged_events_stream

    raw = staged_events_stream(spark, sf_dir)
    clicks = (raw.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("cu"),
                      F.col("event_id").alias("cid"),
                      F.col("ts").alias("cts"))
              .withWatermark("cts", "10 minutes"))
    views = (raw.filter(F.col("event_type") == "view")
             .select(F.col("user_id").alias("vu"),
                     F.col("event_id").alias("vid"),
                     F.col("ts").alias("vts"))
             .withWatermark("vts", "10 minutes"))
    pairs = clicks.join(
        views,
        F.expr("""
            cu = vu AND
            vts >= cts - INTERVAL 10 MINUTES AND vts < cts
        """))
    agg = (pairs.groupBy(F.window("cts", "1 day"))
           .agg(F.count(F.lit(1)).alias("n_pairs"),
                F.min("cid").alias("min_click"),
                F.max("vid").alias("max_view")))
    from cdc_plg_spark.streaming.core import run_to_table

    out = run_to_table(agg, output_mode="append")
    return out.select(F.col("window.start").alias("window_start"),
                      "n_pairs", "min_click", "max_view")


@register(
    "stream_update_mode_agg",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value, 4) * 10000 AS BIGINT)) AS DOUBLE)
               / 10000 AS sum_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming",),
)
def stream_update_mode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE output mode — the third emission contract (append emits
    once-per-finalized-result, complete re-emits everything, update
    emits each key's NEW value whenever a batch changes it). This is
    the changelog-out face of the engine: what a foreachBatch upsert
    sink (README.md:59-68) consumes to maintain a keyed table
    incrementally.

    The sentinel-staged source gives three batches, so keys touched in
    several batches emit several versions into the memory sink; the
    final materialized state — latest emission per key — must equal
    the batch aggregate exactly (the update stream's defining
    invariant). The sink-side compaction is the same latest-per-key
    window the CDC operators use, keyed on the sink's arrival order."""
    from cdc_plg_spark.streaming.core import staged_events_stream

    from pyspark.sql import Window

    raw = (staged_events_stream(spark, sf_dir)
           .filter(F.col("user_id") >= 0))
    cents = (F.floor(F.abs(F.col("value") * 10000) + F.lit(0.5))
             * F.signum(F.col("value"))).cast("long")
    agg = (raw.groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_events"),
                (F.sum(cents).cast("double") / 10000).alias("sum_value")))
    from cdc_plg_spark.streaming.core import run_to_table

    out = run_to_table(agg, output_mode="update")
    # memory sink preserves insertion order per key: keep each key's
    # last emitted version (monotone n_events makes this checkable)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (out.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1).drop("_r"))


@register(
    "stream_state_reader",
    oracle="""
    SELECT CAST(to_timestamp(floor(epoch(ts) / 86400) * 86400)
               AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a streaming query's STATE STORE as a batch table (Spark 4
    statestore data source): run a daily windowed count to a
    checkpoint, then open the checkpoint's state offline and project
    the keyed counts back out. The state store IS the engine's
    materialized CDC table — the RFC's plugins keep equivalent state
    opaquely inside the guest (README.md:89); here it is a queryable
    DataFrame, so an operator can audit, debug, or bootstrap-migrate
    live state without touching the running query.

    The invariant checked by the oracle: complete-mode aggregate state
    over the full replay equals the batch aggregate, read not from
    the sink but from the operator's own internal store."""
    import tempfile

    from cdc_plg_spark.streaming.core import read_events_stream

    ckpt = tempfile.mkdtemp(prefix="state_reader_ckpt_")
    ev = read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    agg = (ev.groupBy(F.window("ts", "1 day"), "event_type")
           .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.writeStream.format("noop")
         .outputMode("complete").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"))


SESSION_GAP_S = 3600


@register(
    "stream_timeout_sessionize",
    oracle=f"""
    WITH e AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events),
    marked AS (
        SELECT user_id, ts_s,
               CASE WHEN ts_s - LAG(ts_s) OVER (PARTITION BY user_id
                                                ORDER BY ts_s)
                         > {SESSION_GAP_S}
                    THEN 1 ELSE 0 END AS new_sess
        FROM e),
    sess AS (
        SELECT user_id, ts_s,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_s
                                   ROWS UNBOUNDED PRECEDING) AS sid
        FROM marked)
    SELECT user_id, MIN(ts_s) AS start_s, MAX(ts_s) AS end_s,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM sess GROUP BY user_id, sid
    """,
    tags=("streaming",),
)
def stream_timeout_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME TIMERS: per-user sessions closed by an inactivity
    timeout, not by incoming data — applyInPandasWithState with
    EventTimeTimeout. Each key buffers its event times and arms a
    timer at last_seen + gap; when the WATERMARK (the reference's
    resolved-ts, README.md:64) passes that instant, the timed-out
    callback splits the buffer into gap-delimited sessions, emits
    every session provably closed, and re-arms for the open tail.
    This is the stateful-plugin pattern (README.md:89) that reacts to
    the PASSAGE OF EVENT TIME rather than to events — the semantics
    session_window provides declaratively, re-built on raw timers to
    exercise the timeout API (and oracle-checked against the
    gaps-and-islands batch form, exactly, at every sf).

    Two hard-won layout rules (see staged_events_stream): Catalyst
    pushes filters BELOW the EventTimeWatermark node, so the sentinel
    rows must NOT be filtered out before groupBy — the sentinel key
    is handled inside the function (consume, never arm a timer); and
    timers within the final watermark-delay window need a batch after
    their arming watermark advance, hence the third sentinel."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cdc_plg_spark.streaming.core import (run_to_table,
                                              staged_events_stream)

    gap = SESSION_GAP_S

    def sessionize(key, pdf_iter, state: GroupState):
        if key[0] < 0:              # sentinel key: consume, no timer
            for _ in pdf_iter:
                pass
            return
        buf = list(state.get[0]) if state.exists else []
        if state.hasTimedOut:
            wm_s = state.getCurrentWatermarkMs() // 1000
            out, keep, cur = [], [], []
            for t in sorted(buf):
                if cur and t - cur[-1] > gap:
                    if cur[-1] + gap <= wm_s:
                        out.append((key[0], cur[0], cur[-1], len(cur)))
                    else:
                        keep.extend(cur)
                    cur = []
                cur.append(t)
            if cur:
                if cur[-1] + gap <= wm_s:
                    out.append((key[0], cur[0], cur[-1], len(cur)))
                else:
                    keep.extend(cur)
            if keep:
                state.update((keep,))
                state.setTimeoutTimestamp((max(keep) + gap) * 1000)
            else:
                state.remove()
            if out:
                yield pd.DataFrame(
                    out, columns=["user_id", "start_s", "end_s", "n"])
        else:
            for pdf in pdf_iter:
                buf.extend(
                    (pdf["ts"].astype("int64") // 1_000_000_000).tolist())
            state.update((buf,))
            state.setTimeoutTimestamp((max(buf) + gap) * 1000)
            return

    ev = staged_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    res = (ev.groupBy("user_id").applyInPandasWithState(
        sessionize,
        "user_id BIGINT, start_s BIGINT, end_s BIGINT, n BIGINT",
        "buf ARRAY<BIGINT>", "append", GroupStateTimeout.EventTimeTimeout))
    return run_to_table(res, output_mode="append")


@register(
    "pipeline_cdc_standing",
    oracle="""
    WITH env AS (
        SELECT ts AS commit_ts, user_id, value,
               CASE WHEN event_type = 'signup' THEN 'I'
                    WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
        FROM events),
    live AS (SELECT * FROM env WHERE op <> 'D')
    SELECT CAST(to_timestamp(floor(epoch(commit_ts) / 3600) * 3600)
                AS TIMESTAMP) AS window_start,
           c.c_mktsegment AS segment,
           COUNT(*) AS n_changes,
           CAST(SUM(CAST(l.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM live l JOIN customer c ON l.user_id = c.c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "cdc"),
)
def pipeline_cdc_standing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RFC's whole data plane as ONE standing query: changelog →
    envelope derivation (README.md:62) → delete filtering → exactly-
    once dedup by event id (README.md:119) → broadcast dimension
    enrichment (README.md:89's reference-data host_call) → hourly
    watermark-finalized rollup (README.md:64's resolved-ts flush).
    Four stages that would be four jobs in a batch-DAG deployment run
    as one incremental plan with two stateful operators (dedup state +
    open windows), both bounded by the same watermark.  The batch
    oracle states the end-to-end contract; dedup is a no-op on the
    unique fixture ids, which is exactly what idempotence means."""
    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.streaming.core import to_cdc_envelope

    env = to_cdc_envelope(
        read_events_stream(spark, sf_dir)).withWatermark("commit_ts", "1 hour")
    live = (env.filter(F.col("op") != "D")
            .select("commit_ts", F.col("after.user_id").alias("user_id"),
                    F.col("after.event_id").alias("event_id"),
                    F.col("after.value").alias("value"))
            .dropDuplicatesWithinWatermark(["event_id"]))
    dim = (load_table(spark, "customer", sf_dir)
           .select(F.col("c_custkey").alias("user_id"),
                   F.col("c_mktsegment").alias("segment")))
    agg = (live.join(F.broadcast(dim), "user_id")
           .groupBy(F.window("commit_ts", "1 hour"), "segment")
           .agg(F.count(F.lit(1)).alias("n_changes"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                 .cast("double").alias("sum_value")))
    out = run_to_table(agg, output_mode="complete")
    return out.select(F.col("window.start").alias("window_start"),
                      "segment", "n_changes", "sum_value")


def _ensure_doc_batch_chunks(spark: SparkSession, sf_dir: str) -> str:
    """Re-chunk the ARRIVING documents (doc_id % 10 == 0, the
    incremental-dedup batch split) into 3 explicit parquet files —
    one per (doc_id div 10) % 3 value — so availableNow +
    maxFilesPerTrigger=1 genuinely replays a multi-micro-batch
    arrival.  Same scratch-then-atomic-rename discipline as
    _ensure_event_chunks (a crash never publishes a partial layout),
    one explicit file per chunk id (never repartition-sampler luck)."""
    import os as _os
    import shutil as _sh

    from cdc_plg_spark.catalog import cache_dir, load_table

    chunks = cache_dir("incrdedup_chunks", sf_dir)
    if not _os.path.isdir(chunks):
        build = chunks + ".build"
        _sh.rmtree(build, ignore_errors=True)
        _os.makedirs(build)
        batch = (load_table(spark, "documents", sf_dir)
                 .filter(F.col("doc_id") % 10 == 0)
                 .select("doc_id", "text"))
        for i in range(3):
            tmp = _os.path.join(build, f"_b{i}")
            (batch.filter((F.col("doc_id") / 10 % 3).cast("int") == i)
             .coalesce(1).write.mode("overwrite").parquet(tmp))
            part = next(f for f in _os.listdir(tmp)
                        if f.endswith(".parquet") and not f.startswith("."))
            _os.replace(_os.path.join(tmp, part),
                        _os.path.join(build, f"chunk{i}.parquet"))
            _sh.rmtree(tmp)
        try:
            _os.rename(build, chunks)
        except OSError:
            _sh.rmtree(build, ignore_errors=True)  # concurrent builder won
    return chunks


from cdc_plg_spark.operators.dedup import INCR_SCREEN_ORACLE_SQL


@register(
    "stream_dedup_vs_index",
    oracle=INCR_SCREEN_ORACLE_SQL,
    tags=("streaming", "lsh", "incremental"),
)
def stream_dedup_vs_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental near-dup screen as a STREAM: arriving documents
    replay as 3 micro-batches (file source, one chunk per trigger) and
    each micro-batch is screened inside ``foreachBatch`` against the
    STATIC history LSH index — `screen_against_index`, the exact
    kernel the batch exhibit runs, so streaming and batch semantics
    cannot drift and ONE oracle states both contracts.  Screening is
    per-doc independent (no cross-batch state), which is precisely why
    the incremental architecture works: a CDC feed of new documents
    needs only its own signatures plus index probes per epoch, never a
    corpus re-pair.  Results append to a per-run parquet accumulator
    keyed by epoch (idempotent re-apply: overwrite-by-epoch-dir, the
    README.md:119 checkpoint-ts discipline); the driver reads the
    accumulated verdicts back as one batch DataFrame."""
    import os as _os
    import tempfile as _tf
    import uuid as _uuid

    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.operators.dedup import (_checked_sig_bands,
                                               screen_against_index)
    from cdc_plg_spark.streaming.core import run_foreach_batch

    chunks = _ensure_doc_batch_chunks(spark, sf_dir)
    hist = (load_table(spark, "documents", sf_dir)
            .filter(F.col("doc_id") % 10 != 0).select("doc_id", "text"))
    # materialize the index ONCE (eager localCheckpoint): these frames
    # are captured by the foreachBatch closure, and lazy plans would
    # re-run the O(corpus) signature computation EVERY micro-batch —
    # the exact cost the incremental architecture exists to avoid (in
    # production this is the persisted bucketed index table)
    hist_sig, hist_bands = _checked_sig_bands(hist)
    hist_sig = hist_sig.localCheckpoint(eager=True)
    hist_bands = hist_bands.localCheckpoint(eager=True)

    # Scratch hygiene (the r10 leaked-directory-pair lesson): the
    # checkpoint is per-run and removed in `finally` once availableNow
    # terminates; the OUTPUT must outlive this function (the returned
    # DataFrame reads it lazily — the driver collects after we return),
    # so it lives under the cache root where each run purges its
    # predecessors' runs first (single sequential writer per sf — the
    # driver/bench/test harnesses all run queries serially).
    import shutil as _sh

    from cdc_plg_spark.catalog import cache_dir

    out_base = cache_dir("incrdedup_out", sf_dir)
    _os.makedirs(out_base, exist_ok=True)
    for prev in _os.listdir(out_base):
        _sh.rmtree(_os.path.join(out_base, prev), ignore_errors=True)
    out_dir = _os.path.join(out_base, f"run_{_uuid.uuid4().hex[:12]}")
    ckpt = _tf.mkdtemp(prefix="incrdedup_ckpt_")

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .parquet(_os.path.join(chunks, "chunk*.parquet")))

    def screen_batch(bdf: DataFrame, epoch_id: int) -> None:
        (screen_against_index(bdf, hist_sig, hist_bands)
         .write.mode("overwrite")
         .parquet(_os.path.join(out_dir, f"epoch={epoch_id}")))

    try:
        run_foreach_batch(stream, screen_batch, ckpt)
    finally:
        _sh.rmtree(ckpt, ignore_errors=True)
    return (spark.read.option("basePath", out_dir)
            .parquet(_os.path.join(out_dir, "epoch=*"))
            .select("doc_id", "is_dup", "matched_doc", "n_match"))
