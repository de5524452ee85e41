"""Multi-batch streaming behaviors the single-replay oracle can't see:
watermark late-data eviction and checkpointed exactly-once restart
(the reference's resolved-ts / checkpoint-ts contracts,
/root/reference/README.md:64-65, :119).

Each test feeds a file-source stream one file per trigger
(maxFilesPerTrigger=1) so watermarks advance between micro-batches
deterministically.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.streaming.core import run_foreach_batch


def _write_batch_file(spark, rows, schema, path, name):
    from datetime import datetime
    rows = [tuple(datetime.fromisoformat(v) if isinstance(v, str) and ":" in v
                  else v for v in r) for r in rows]
    (spark.createDataFrame(rows, schema)
     .coalesce(1).write.mode("overwrite").parquet(os.path.join(path, name)))


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="cdc_stream_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events_stream(spark, src_dir, max_files=1):
    return (spark.readStream
            .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE")
            .option("maxFilesPerTrigger", max_files)
            .parquet(src_dir + "/*"))


def test_watermark_drops_late_data(spark, tdir):
    """A row older than (max event time - watermark delay) arriving in a
    later batch must be dropped from the windowed aggregate — Spark's
    watermark implements the RFC's resolved-ts flush: once T is
    resolved, events <= T are final."""
    src = os.path.join(tdir, "src")
    os.makedirs(src)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    # batch 1: events at 10:00 and 12:00 -> watermark advances to 11:50
    _write_batch_file(spark, [
        (1, "2024-01-01 10:00:00", 1, 1.0),
        (2, "2024-01-01 12:00:00", 1, 1.0),
    ], schema, src, "b1")

    ev = _events_stream(spark, src).withWatermark("ts", "10 minutes")
    agg = ev.groupBy(F.window("ts", "1 hour")).agg(F.count("*").alias("n"))

    name = "wm_late_sink"
    ckpt = os.path.join(tdir, "ckpt")
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
        # batch 2: one late row at 10:30 (< 11:50 watermark -> dropped),
        # one on-time row at 13:00
        _write_batch_file(spark, [
            (3, "2024-01-01 10:30:00", 1, 1.0),
            (4, "2024-01-01 13:00:00", 1, 1.0),
        ], schema, src, "b2")
        q.processAllAvailable()
        # batch 3: push watermark past 13:00 so the 12:00 window closes
        _write_batch_file(spark, [
            (5, "2024-01-01 14:00:00", 1, 1.0),
        ], schema, src, "b3")
        q.processAllAvailable()
    finally:
        q.stop()

    out = {r["window"].start.hour: r["n"]
           for r in spark.table(name).collect()}
    # 10:00 window closed with ONE row: the late event_id=3 was dropped
    assert out.get(10) == 1, f"late row leaked into closed window: {out}"
    assert out.get(12) == 1


def test_checkpoint_restart_no_reprocess(spark, tdir):
    """Stop a checkpointed foreachBatch query, add data, restart with the
    same checkpointLocation: already-committed batches must not re-emit
    (exactly-once via the commit log = the RFC's checkpoint-ts)."""
    src = os.path.join(tdir, "src")
    os.makedirs(src)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    out_dir = os.path.join(tdir, "out")
    ckpt = os.path.join(tdir, "ckpt")

    seen_epochs = []

    def write_batch(df, epoch_id):
        seen_epochs.append(epoch_id)
        (df.withColumn("epoch_id", F.lit(epoch_id))
         .write.mode("append").parquet(out_dir))

    _write_batch_file(spark, [(1, "2024-01-01 10:00:00", 1, 1.0)],
                      schema, src, "b1")
    run_foreach_batch(_events_stream(spark, src), write_batch, ckpt)
    first_run_rows = spark.read.parquet(out_dir).count()
    assert first_run_rows == 1

    # restart from the same checkpoint with one new file
    _write_batch_file(spark, [(2, "2024-01-01 11:00:00", 1, 1.0)],
                      schema, src, "b2")
    run_foreach_batch(_events_stream(spark, src), write_batch, ckpt)

    out = spark.read.parquet(out_dir)
    assert out.count() == 2, "restart reprocessed committed data"
    # the restarted run got a fresh epoch id (commit log advanced)
    assert len(set(seen_epochs)) == len(seen_epochs)
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2]


def test_cdc_envelope_roundtrip(spark, sf_small):
    """to_cdc_envelope emits the RowChangedEvent shape (README.md:62):
    inserts carry no before-image, deletes no after-image, and the JSON
    wire format (README.md:75) round-trips losslessly."""
    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.streaming.core import to_cdc_envelope

    ev = load_table(spark, "events", sf_small).limit(200)
    env = to_cdc_envelope(ev)
    rows = env.collect()
    assert rows, "envelope empty"
    for r in rows:
        if r["op"] == "I":
            assert r["before"] is None and r["after"] is not None
        elif r["op"] == "D":
            assert r["after"] is None and r["before"] is not None
        else:
            assert r["before"] is not None and r["after"] is not None

    # JSON wire round-trip: to_json -> from_json preserves the envelope
    wire = env.select(F.to_json(F.struct("*")).alias("value"))
    decoded = wire.select(
        F.from_json("value", env.schema).alias("e")).select("e.*")
    # from_json marks every field nullable; compare names + types only
    assert [(f.name, f.dataType) for f in decoded.schema.fields] == \
           [(f.name, f.dataType) for f in env.schema.fields]
    assert decoded.count() == len(rows)


def test_checkpoint_restart_with_plugin_swap(spark, tdir):
    """The reference's 2PC plugin upgrade (README.md:99-119), Spark-
    native (SURVEY.md §3.4): stop the query, deploy NEW transform
    code, restart from the SAME checkpoint. Contract: data committed
    under plugin v1 is not reprocessed (keeps v1 output), data after
    the swap gets v2 — upgrade without replay, atomicity from the
    commit log instead of a distributed prepare/pause/commit."""
    src = os.path.join(tdir, "src")
    os.makedirs(src)
    schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, value DOUBLE"
    out_dir = os.path.join(tdir, "out")
    ckpt = os.path.join(tdir, "ckpt")

    def make_plugin(version, scale):
        def plugin(df, epoch_id):
            (df.withColumn("plugin_version", F.lit(version))
             .withColumn("scaled", F.col("value") * scale)
             .write.mode("append").parquet(out_dir))
        return plugin

    _write_batch_file(spark, [(1, "2024-01-01 10:00:00", 1, 2.0)],
                      schema, src, "b1")
    run_foreach_batch(_events_stream(spark, src), make_plugin("v1", 10), ckpt)

    # swap: same checkpoint, new plugin code
    _write_batch_file(spark, [(2, "2024-01-01 11:00:00", 1, 3.0)],
                      schema, src, "b2")
    run_foreach_batch(_events_stream(spark, src), make_plugin("v2", 100), ckpt)

    rows = {r["event_id"]: (r["plugin_version"], r["scaled"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {1: ("v1", 20.0), 2: ("v2", 300.0)}, rows


def test_stream_ts_range_matches_batch(spark, sf_dir):
    """The round-3 regression guard: the file-source stream must see the
    SAME event-time range as the batch reader.  A schema/conversion
    mismatch (e.g. applying a ns-era div-1000 to µs fixtures) collapses
    stream timestamps into 1970 and silently shrinks every windowed
    result — cheap to assert, catastrophic to miss."""
    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.streaming.core import read_events_stream, run_to_table

    batch = (load_table(spark, "events", sf_dir)
             .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
             .collect()[0])
    streamed = run_to_table(
        read_events_stream(spark, sf_dir)
        .groupBy().agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")),
        output_mode="complete").collect()[0]
    assert streamed["lo"] == batch["lo"], (streamed, batch)
    assert streamed["hi"] == batch["hi"], (streamed, batch)


def test_staged_stream_covers_batch_range(spark, sf_dir):
    """staged_events_stream = fixture + future sentinels: real rows must
    span exactly the batch range, sentinels must all be strictly later
    (they advance the watermark past every real event)."""
    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.streaming.core import run_to_table, staged_events_stream

    batch = (load_table(spark, "events", sf_dir)
             .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
             .collect()[0])
    rows = run_to_table(
        staged_events_stream(spark, sf_dir)
        .groupBy(F.col("user_id") < 0)
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")),
        output_mode="complete").collect()
    by_sentinel = {r[0]: r for r in rows}
    real, sent = by_sentinel[False], by_sentinel[True]
    assert (real["lo"], real["hi"]) == (batch["lo"], batch["hi"])
    assert sent["lo"] > batch["hi"]


def test_ddl_additive_evolve_mid_stream(spark, sf_dir):
    """Additive-DDL-without-restart contract: one uninterrupted 3-batch
    run must produce rows under BOTH schema versions (the DDL event
    lands mid-stream), the evolved column must be NULL exactly for
    pre-DDL event time and equal round(value*0.9, 4) after, and the
    merged result must replay-match the batch equivalent row-for-row."""
    from cdc_plg_spark import registry
    from cdc_plg_spark.catalog import load_table

    out = registry.all_entries()["stream_ddl_additive_evolve"].fn(
        spark, sf_dir)
    ev = load_table(spark, "events", sf_dir)
    lo, hi = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).collect()[0]
    ddl_us = lo + (hi - lo) // 2

    by_ver = {r["schema_version"]: r["n"]
              for r in out.groupBy("schema_version")
                          .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by_ver.get(1, 0) > 0 and by_ver.get(2, 0) > 0, by_ver

    # evolved column nullness must split exactly at the DDL timestamp
    bad = out.filter(
        ((F.col("ts_us") < ddl_us) & F.col("value_eur").isNotNull())
        | ((F.col("ts_us") >= ddl_us) & F.col("value_eur").isNull())).count()
    assert bad == 0

    # replay equivalence vs the batch-computed evolution
    batch = ev.select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "user_id",
        "event_type", F.round("value", 4).alias("value"),
        F.when(F.unix_micros("ts") >= ddl_us,
               F.round(F.col("value") * 0.9, 4)).alias("value_eur"),
        F.when(F.unix_micros("ts") >= ddl_us, F.lit(2))
         .otherwise(F.lit(1)).cast("int").alias("schema_version"))
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_foreach_batch_plugin_isolation(spark, tdir):
    """The reference's sandbox guarantee (README.md:38-49,:124-125 — a
    plugin must not crash the engine), Spark-natively: a plugin that
    raises on one micro-batch must NOT kill the stream; the poison
    batch is quarantined to the dead-letter dir with its error record,
    every other batch lands normally, and the checkpoint marks the
    epoch consumed so a restart does not crash-loop on it."""
    from cdc_plg_spark.streaming.core import (
        run_foreach_batch_isolated, staged_events_stream,
    )

    out = os.path.join(tdir, "out")
    dlq = os.path.join(tdir, "dlq")
    ckpt = os.path.join(tdir, "ckpt")
    os.makedirs(out)

    def plugin(batch_df, epoch_id):
        if epoch_id == 1:
            raise RuntimeError("plugin bug: division by zero in v2")
        (batch_df.groupBy("event_type").count()
         .withColumn("epoch", F.lit(epoch_id))
         .write.mode("append").parquet(out))

    stream = staged_events_stream(spark, "/root/testdata/sf0.001")
    poisoned = run_foreach_batch_isolated(stream, plugin, ckpt, dlq)
    assert poisoned == [1]
    # good epochs landed (4 staged batches -> epochs 0,2,3 succeeded)
    ok = spark.read.parquet(out)
    assert {r["epoch"] for r in ok.select("epoch").distinct().collect()} \
        == {0, 2, 3}
    # the poison batch is fully quarantined with its error record
    q = spark.read.parquet(os.path.join(dlq, "epoch=1"))
    assert q.count() > 0
    import json as _json
    with open(os.path.join(dlq, "epoch=1", "_ERROR.json")) as f:
        err = _json.load(f)
    assert err["epoch"] == 1 and "plugin bug" in err["error"]
    # restart: checkpoint consumed everything; no epoch re-poisons
    assert run_foreach_batch_isolated(
        staged_events_stream(spark, "/root/testdata/sf0.001"),
        plugin, ckpt, dlq) == []


def test_stream_dedup_vs_index_is_multibatch_and_equals_batch(spark, sf_dir):
    """The streaming incremental-dedup twin must (a) genuinely replay
    MULTIPLE micro-batches — 3 chunk files, one per trigger — and (b)
    produce exactly the batch exhibit's verdicts (screening is per-doc
    independent; both run screen_against_index, one oracle states
    both).  (a) is pinned by the per-epoch output layout; (b) by a
    full row-set compare."""
    from cdc_plg_spark import registry

    registry.load_all()
    got = (registry.get("stream_dedup_vs_index").fn(spark, sf_dir)
           .toPandas().sort_values("doc_id").reset_index(drop=True))
    # (a): 3 non-empty chunk files exist, and maxFilesPerTrigger=1
    # makes each its own micro-batch
    from cdc_plg_spark.streaming.queries import _ensure_doc_batch_chunks
    chunks = _ensure_doc_batch_chunks(spark, sf_dir)
    files = [f for f in os.listdir(chunks) if f.endswith(".parquet")]
    assert len(files) == 3
    assert all(os.path.getsize(os.path.join(chunks, f)) > 0 for f in files)
    want = (registry.get("dedup_incremental_vs_index").fn(spark, sf_dir)
            .toPandas().sort_values("doc_id").reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
