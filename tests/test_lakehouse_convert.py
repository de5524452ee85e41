"""CONVERT TO TXLOG tests: adopt an existing parquet directory as a
table by reference — zero data read or rewritten at convert time
(footer stats only), full format capabilities afterwards (MERGE,
time travel, CDF, OPTIMIZE, vacuum owning the root directory).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import TxLogTable


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_convert_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def write_plain(spark, path, n=200, partition_by=None):
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string"))
         .alias("cat"))
    w = df.repartitionByRange(4, "user_id").write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return df


def test_convert_flat_dir_by_reference(spark, tdir):
    path = os.path.join(tdir, "t")
    write_plain(spark, path)
    sizes_before = {f: os.path.getsize(os.path.join(path, f))
                    for f in os.listdir(path) if f.endswith(".parquet")}
    t = TxLogTable.convert(spark, path, "user_id")
    # by reference: the exact same bytes, now manifested with stats
    assert {os.path.basename(p): s["bytes"]
            for p, s in t.snapshot().files.items()} == sizes_before
    got = {r["user_id"]: (r["value"], r["cat"])
           for r in t.read().collect()}
    assert got == {k: (k * 2, f"c{k % 3}") for k in range(200)}
    assert t.fsck(deep=True) == []
    # key-range pruning works off the imported footer stats
    probe = t.read(key_between=(0, 10))
    assert len(probe.inputFiles()) < 4
    # and the table is fully writable: MERGE + CDF + time travel
    src = spark.createDataFrame([(5, -1, "cX", "U"), (999, 0, "cY", "I")],
                                "user_id long, value long, cat string, "
                                "op string")
    m = t.merge(src, op_col="op")
    assert m["files_scanned"] < 4        # imported stats pruned the COW
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got[5] == -1 and got[999] == 0 and len(got) == 201
    assert {(r["change_type"], r["user_id"])
            for r in t.table_changes(0, m["version"]).collect()} \
        == {("U", 5), ("I", 999)}
    assert t.read(version=0).count() == 200


def test_convert_hive_partitioned_dir(spark, tdir):
    path = os.path.join(tdir, "t")
    write_plain(spark, path, partition_by=["cat"])
    t = TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"cat": "string"})
    snap = t.snapshot()
    assert snap.partition_by == ["cat"]
    assert all(set(s["partition"]) == {"cat"}
               for s in snap.files.values())
    got = {r["user_id"]: (r["value"], r["cat"])
           for r in t.read().collect()}
    assert got == {k: (k * 2, f"c{k % 3}") for k in range(200)}
    assert t.fsck() == []
    # partition pruning straight off the imported manifest
    pruned = t.read(where_between=("cat", "c1", "c1"))
    assert {r["cat"] for r in pruned.collect()} == {"c1"}
    assert len(pruned.inputFiles()) < len(snap.files)
    # merges keep landing in the hive layout
    src = spark.createDataFrame([(5, -1, "c9", "U")],
                                "user_id long, value long, cat string, "
                                "op string")
    t.merge(src, op_col="op")
    assert t.fsck() == []


def test_vacuum_owns_root_on_converted_table(spark, tdir):
    path = os.path.join(tdir, "t")
    write_plain(spark, path)
    t = TxLogTable.convert(spark, path, "user_id")
    t.merge(spark.createDataFrame([(5, -1, "cX", "U")],
                                  "user_id long, value long, "
                                  "cat string, op string"),
            op_col="op")
    # the rewrite removed some imported files from the manifest; they
    # sit OUTSIDE data/, so only the owns_root sweep can collect them
    t.vacuum(retain_last=1, min_age_s=0)
    on_disk = sorted(
        os.path.relpath(os.path.join(dp, f), t.path)
        for dp, _, fs in os.walk(t.path) for f in fs
        if f.endswith(".parquet") and "_txlog" not in dp)
    assert on_disk == sorted(t.snapshot().files)
    assert t.read().count() == 200
    assert t.fsck(deep=True) == []


def test_convert_then_repartition_layout(spark, tdir):
    """Converted tables compose with partition-spec evolution: the
    imported flat files rewrite into a hive layout, the evolution
    commit nets empty in the change feed, and owns_root vacuum then
    collects the superseded imported files."""
    path = os.path.join(tdir, "t")
    write_plain(spark, path)
    t = TxLogTable.convert(spark, path, "user_id")
    before = {r["user_id"]: (r["value"], r["cat"])
              for r in t.read().collect()}
    m = t.repartition_layout(["cat"])
    assert {r["user_id"]: (r["value"], r["cat"])
            for r in t.read().collect()} == before
    assert t.table_changes(m["version"] - 1, m["version"]).count() == 0
    assert t.fsck() == []
    t.vacuum(retain_last=1, min_age_s=0)
    on_disk = sorted(
        os.path.relpath(os.path.join(dp, f), t.path)
        for dp, _, fs in os.walk(t.path) for f in fs
        if f.endswith(".parquet") and "_txlog" not in dp)
    assert on_disk == sorted(t.snapshot().files)
    assert t.detail()["converted"] is True


@pytest.mark.parametrize("vseed", [3])
def test_random_ops_on_converted_table_match_model(spark, tdir, vseed):
    """The dict-model random-op check on a CONVERTED table: imported
    files must behave exactly like native ones under MERGE / COW + DV
    DELETE / OPTIMIZE / owns_root VACUUM interleavings."""
    import random

    rng = random.Random(vseed)
    path = os.path.join(tdir, "t")
    write_plain(spark, path, n=40)
    t = TxLogTable.convert(spark, path, "user_id")
    model = {k: (k * 2, f"c{k % 3}") for k in range(40)}

    for step in range(8):
        kind = rng.choices(("merge", "delete_dv", "delete_cow",
                            "optimize", "vacuum"),
                           weights=(5, 2, 1, 1, 1))[0]
        if kind == "merge":
            rows, ops = [], {}
            for k in rng.sample(range(80), rng.randint(1, 6)):
                op = rng.choice("IUD")
                v = rng.randint(-99, 99)
                rows.append((k, v, f"c{k % 3}", op))
                ops[k] = (op, v)
            t.merge(spark.createDataFrame(
                rows, "user_id long, value long, cat string, "
                      "op string"), op_col="op")
            for k, (op, v) in ops.items():
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = (v, f"c{k % 3}")
        elif kind in ("delete_dv", "delete_cow"):
            lo = rng.randint(0, 70)
            hi = lo + rng.randint(0, 20)
            t.delete_where((lo, hi),
                           mode=kind.removeprefix("delete_"))
            for k in list(model):
                if lo <= k <= hi:
                    del model[k]
        elif kind == "optimize":
            t.optimize(target_files=2)
        else:
            t.vacuum(retain_last=2, min_age_s=0)
        got = {r["user_id"]: (r["value"], r["cat"])
               for r in t.read().collect()}
        assert got == model, f"step {step} ({kind}) diverged"
        assert t.fsck() == []


def test_convert_validation(spark, tdir):
    path = os.path.join(tdir, "t")
    write_plain(spark, path, partition_by=["cat"])
    with pytest.raises(ValueError, match="partition_schema"):
        TxLogTable.convert(spark, path, "user_id")   # undeclared hive
    with pytest.raises(ValueError, match="not in imported schema"):
        TxLogTable.convert(spark, path, "nope",
                           partition_schema={"cat": "string"})
    with pytest.raises(ValueError, match="only"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"cat": "double"})
    empty = os.path.join(tdir, "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        TxLogTable.convert(spark, empty, "user_id")
    # NULL keys refuse the convert
    nulls = os.path.join(tdir, "nulls")
    spark.createDataFrame([(1, 1), (None, 2)],
                          "user_id long, value long") \
        .coalesce(1).write.parquet(nulls)
    with pytest.raises(ValueError, match="NULL keys"):
        TxLogTable.convert(spark, nulls, "user_id")


def test_convert_ns_unit_timestamps_stat_domain(spark, tdir):
    """A foreign parquet file with TIMESTAMP(NANOS) columns: the
    engine reads those as LONG nanoseconds (nanosAsLong — Spark has
    no ns type), so the imported footer stats must be raw ns integers.
    µs-floored stats (what naive _stat_encode produces from pyarrow's
    Timestamp objects) would be 1000x off the row values and mis-prune
    — and even in a µs-consistent domain, flooring breaks the
    delete_where all-rows-match proof at the boundary (a row 500 ns
    above `hi` shares hi's floored µs).  Both directions pinned here.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(tdir, "t")
    os.makedirs(path)
    base = 1_700_000_000_000_000_000       # epoch ns
    us = 1_000
    # file A: keys 0-9, ts base .. base+9µs (+500ns each, sub-µs)
    # file B: keys 10-19, ts base+100µs .. base+109µs (+500ns each)
    for fname, k0, t0 in (("a.parquet", 0, base),
                          ("b.parquet", 10, base + 100 * us)):
        tb = pa.table({
            "user_id": pa.array(range(k0, k0 + 10), type=pa.int64()),
            "ts": pa.array([t0 + i * us + 500 for i in range(10)],
                           type=pa.timestamp("ns"))})
        pq.write_table(tb, os.path.join(path, fname))
    t = TxLogTable.convert(spark, path, "user_id")
    # stats landed in the ns domain the reader sees
    snap = t.snapshot()
    for s in snap.files.values():
        lo_s, hi_s = s["cols"]["ts"][0], s["cols"]["ts"][1]
        assert lo_s % 1000 == 500 and hi_s % 1000 == 500
    # range read with ns bounds: exact rows (key 4's ts is 500 ns
    # ABOVE the hi bound), file B pruned at the manifest
    got = t.read(where_between=("ts", base, base + 4 * us))
    assert sorted(r["user_id"] for r in got.collect()) == list(range(4))
    assert len(got.inputFiles()) == 1
    # delete boundary: hi lands between A's rows 4 and 5 — file A must
    # NOT whole-drop (its max exceeds hi); rows above hi survive
    m = t.delete_where(where_between=("ts", base, base + 4 * us + 700))
    assert m["files_dropped"] == 0
    assert sorted(r["user_id"] for r in t.read().collect()) == \
        list(range(5, 20))
    # whole-file drop still fires when the proof is exact
    m2 = t.delete_where(where_between=("ts", base, base + 99 * us))
    assert m2["files_dropped"] == 1
    assert sorted(r["user_id"] for r in t.read().collect()) == \
        list(range(10, 20))
    assert t.fsck(deep=True) == []


def write_derived(spark, path, n=240, partition_by=None):
    """Plain-Spark dir with an already-materialized derived column:
    dt = date_format(ts, 'yyyy-MM-dd') over 6 days of March 2024 —
    the upstream-job layout convert(generated=...) formalizes."""
    base_us = 1_709_251_200_000_000          # 2024-03-01 UTC, micros
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"),
        F.timestamp_micros(
            (F.lit(base_us) + (F.col("id") % 6) * F.lit(86_400_000_000)
             + F.col("id") * F.lit(1_000_000)).cast("long")).alias("ts"),
        (F.col("id") * 2).alias("value"))
    df = df.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    w = df.repartitionByRange(4, "user_id").write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return df


def test_convert_with_generated_partition_column(spark, tdir):
    """The migration composition VERDICT r7 #6 names: a hive dir laid
    out by an upstream job's derived column, adopted by reference AND
    formalized as GENERATED ALWAYS AS — existing data validated
    against col<=>expr pre-commit, derived partition pruning from
    source-column predicates afterwards, ingest recomputation across
    the migration boundary, protocol [1,2]."""
    path = os.path.join(tdir, "t")
    write_derived(spark, path, partition_by=["dt"])
    t = TxLogTable.convert(
        spark, path, "user_id", partition_schema={"dt": "string"},
        generated={"dt": "date_format(ts, 'yyyy-MM-dd')"})
    snap = t.snapshot()
    assert snap.protocol == [1, 2]
    assert snap.generated == {"dt": "date_format(ts, 'yyyy-MM-dd')"}
    # derived prune: a predicate on the SOURCE column alone prunes
    # the imported partitions at the manifest
    got = t.read(where_between=("ts", "2024-03-02", "2024-03-03"))
    assert len(got.inputFiles()) < len(snap.files)
    full = t.read().filter(F.col("ts").between("2024-03-02",
                                               "2024-03-03"))
    assert (got.exceptAll(full).count() == 0
            and full.exceptAll(got).count() == 0)
    assert got.count() > 0
    # ingest across the boundary: append OMITTING dt computes it;
    # a partial ts-merge moves the row's partition with it
    t.append(spark.sql(
        "SELECT 9001L AS user_id, TIMESTAMP '2024-03-09 00:00:00' "
        "AS ts, 0L AS value"))
    moved = spark.createDataFrame(
        [(0, "2024-03-06 12:00:00")], "user_id long, ts string"
    ).select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    t.merge(moved, partial=True)
    got = {r["user_id"]: r["dt"] for r in t.read().filter(
        F.col("user_id").isin(9001, 0)).collect()}
    assert got == {9001: "2024-03-09", 0: "2024-03-06"}
    assert t.fsck(deep=True) == []


def test_convert_generated_on_materialized_file_column(spark, tdir):
    """Same contract for a NON-partition generated column: the bucket
    column lives in the file bytes, stats-based derived pruning works
    off the imported footers."""
    path = os.path.join(tdir, "t")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), F.col("id").alias("n"))
    df = df.withColumn("bucket", F.expr("floor(n / 50)"))
    df.repartitionByRange(4, "k").write.mode("overwrite").parquet(path)
    t = TxLogTable.convert(spark, path, "k",
                           generated={"bucket": "floor(n / 50)"})
    got = t.read(where_between=("n", 0, 40))
    assert len(got.inputFiles()) < len(t.snapshot().files)
    assert sorted(r["n"] for r in got.collect()) == list(range(41))
    assert t.fsck(deep=True) == []


def test_convert_generated_validation_refuses(spark, tdir):
    """A wrong declaration must refuse BEFORE the commit — in the
    manifest it would silently prune matching files; and a generated
    column absent from the imported files is impossible by reference."""
    from cdc_plg_spark.lakehouse import CheckViolation

    path = os.path.join(tdir, "t")
    write_derived(spark, path, partition_by=["dt"])
    with pytest.raises(CheckViolation, match="violates generated"):
        TxLogTable.convert(
            spark, path, "user_id", partition_schema={"dt": "string"},
            generated={"dt":
                       "date_format(ts + interval 1 day, 'yyyy-MM-dd')"})
    with pytest.raises(ValueError, match="BY REFERENCE"):
        TxLogTable.convert(
            spark, path, "user_id", partition_schema={"dt": "string"},
            generated={"week": "date_format(ts, 'yyyy-ww')"})
    # refusals left no log behind — a clean convert still works
    t = TxLogTable.convert(
        spark, path, "user_id", partition_schema={"dt": "string"},
        generated={"dt": "date_format(ts, 'yyyy-MM-dd')"})
    assert t.read().count() == 240


def test_convert_ns_stat_table_then_widen(spark, tdir):
    """Composition across BOTH migration features (SURVEY r8
    candidate): adopt a foreign dir whose ts column is TIMESTAMP(NANOS)
    — stats kept as raw ns integers — then WIDEN an int column as a
    pure meta commit.  The widen must not move bytes, must not disturb
    the ns stat domain (temporal pruning stays exact at sub-µs
    boundaries), and the narrow INT32 parquet must surface as LONG."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(tdir, "t")
    os.makedirs(path)
    base = 1_700_000_000_000_000_000
    us = 1_000
    for fname, k0, t0 in (("a.parquet", 0, base),
                          ("b.parquet", 10, base + 100 * us)):
        tb = pa.table({
            "user_id": pa.array(range(k0, k0 + 10), type=pa.int64()),
            "v": pa.array([k0 + i for i in range(10)],
                          type=pa.int32()),
            "ts": pa.array([t0 + i * us + 500 for i in range(10)],
                           type=pa.timestamp("ns"))})
        pq.write_table(tb, os.path.join(path, fname))
    t = TxLogTable.convert(spark, path, "user_id")
    files0 = set(t.snapshot().files)
    t.widen_column_type("v", "long")
    snap = t.snapshot()
    assert set(snap.files) == files0          # zero movement
    assert snap.protocol == [2, 2]
    got = t.read()
    assert got.schema["v"].dataType.typeName() == "long"
    # ns stat domain untouched by the widen: sub-µs pruning stays exact
    pruned = t.read(where_between=("ts", base, base + 4 * us))
    assert sorted(r["user_id"] for r in pruned.collect()) == \
        list(range(4))
    assert len(pruned.inputFiles()) == 1
    assert {r["user_id"]: r["v"] for r in got.collect()} == \
        {k: k for k in range(20)}
    assert t.fsck(deep=True) == []


def test_convert_refuses_partition_column_inside_files(spark, tdir):
    """A hand-built hive layout that KEPT the partition column in the
    file bytes (write.partitionBy drops it; foreign writers may not)
    must refuse at convert — appending path-derived part_fields to the
    file schema would import a duplicate-named column and poison every
    later read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(tdir, "t")
    sub = os.path.join(path, "dt=2024-03-01")
    os.makedirs(sub)
    tb = pa.table({
        "user_id": pa.array(range(10), type=pa.int64()),
        "dt": pa.array(["2024-03-01"] * 10)})     # kept in the bytes
    pq.write_table(tb, os.path.join(sub, "a.parquet"))
    with pytest.raises(ValueError, match="paths ONLY"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"})


def test_cdf_stream_over_mixed_timestamp_annotations(spark, tdir):
    """A CONVERTed table legitimately holds files whose parquet
    timestamp annotation differs from the engine's own writes: a seed
    dir written under INT96 (a vanilla session's default
    outputTimestampType) reads back TZ-NAIVE in pyarrow, while engine
    merge files (TIMESTAMP_MICROS, isAdjustedToUTC) read TZ-AWARE.
    The streaming CDF source's executor-side diff then carries BOTH
    kinds in one column — reproduced: a plain pd.to_datetime raised
    'Cannot mix tz-aware with tz-naive' and killed the stream.  The
    session is UTC-pinned, so both kinds are the same instants;
    utc=True normalization must make the stream succeed bit-exactly."""
    from cdc_plg_spark.sources.txlog_stream import TxLogChangesSource

    spark.dataSource.register(TxLogChangesSource)
    path = os.path.join(tdir, "t")
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try:
        spark.sql(
            "SELECT id AS user_id, "
            "timestamp_micros(CAST(1704067200000000 + id * 1000000 "
            "AS LONG)) AS ts, id * 2 AS value FROM range(0, 40)"
        ).repartitionByRange(2, "user_id").write.parquet(path)
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    t = TxLogTable.convert(spark, path, "user_id")
    src = spark.sql(
        "SELECT id AS user_id, "
        "timestamp_micros(CAST(1704067200000000 + id * 1000000 "
        "AS LONG)) AS ts, -1L AS value FROM range(0, 5)")
    t.merge(src)          # engine write: TIMESTAMP_MICROS, tz-aware
    out = os.path.join(tdir, "out")
    q = (spark.readStream.format("txlog_changes")
         .option("path", t.path).option("fullImages", "true").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(tdir, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.read.parquet(out).filter(
        F.col("commit_version") == 1)
    pre = {(r["user_id"], r["value"], r["ts"].isoformat())
           for r in got.filter(F.col("change_type") == "U_pre")
           .collect()}
    post = {(r["user_id"], r["value"])
            for r in got.filter(F.col("change_type") == "U_post")
            .collect()}
    assert post == {(k, -1) for k in range(5)}
    # before-images carry the INT96 file's values as the SAME UTC
    # instants the engine wrote (naive == UTC by session pin;
    # collect() returns session-naive datetimes)
    assert pre == {(k, 2 * k, f"2024-01-01T00:00:{k:02d}")
                   for k in range(5)}


def test_streaming_sink_into_converted_generated_table(spark, tdir):
    """The full migration-to-live-pipeline composition for
    convert(generated=...): an upstream-written hive dir is adopted
    with its derived column formalized, then a STREAM keeps appending
    micro-batches that ship only the source columns — the write path
    must compute event_date per epoch (idempotently), land the rows
    in the right hive partitions, and the change-feed stream over the
    grown table must replay every commit — across seed files whose
    parquet timestamp annotation may differ from the engine's own
    (the tz-canonicalization pin, composed end to end)."""
    from cdc_plg_spark.sources.txlog_stream import TxLogChangesSource
    from cdc_plg_spark.streaming.core import run_foreach_batch

    spark.dataSource.register(TxLogChangesSource)
    path = os.path.join(tdir, "t")
    write_derived(spark, path, n=120, partition_by=["dt"])
    t = TxLogTable.convert(
        spark, path, "user_id", partition_schema={"dt": "string"},
        generated={"dt": "date_format(ts, 'yyyy-MM-dd')"})
    v0_files = len(t.snapshot().files)
    # stream ships (user_id, ts, value) ONLY — no dt column
    src_dir = os.path.join(tdir, "src")
    base_us = 1_709_251_200_000_000
    spark.range(1000, 1060).select(
        F.col("id").alias("user_id"),
        F.timestamp_micros(
            (F.lit(base_us) + (F.col("id") % 3) * F.lit(86_400_000_000))
            .cast("long")).alias("ts"),
        (F.col("id") * 2).alias("value")).write.parquet(src_dir)
    stream = (spark.readStream.schema(
        "user_id long, ts timestamp, value long")
        .option("maxFilesPerTrigger", 1).parquet(src_dir))

    def apply_batch(bdf, epoch):
        TxLogTable(bdf.sparkSession, t.path).append(
            bdf, txn=("cvt_gen_sink", epoch))

    run_foreach_batch(stream, apply_batch, os.path.join(tdir, "ckpt"))
    assert t.read().count() == 180
    assert t.read().filter(
        F.col("dt") != F.date_format("ts", "yyyy-MM-dd")).count() == 0
    # appended rows landed in real hive partitions beyond the seed's
    assert len(t.snapshot().files) > v0_files
    # the change feed replays every commit incl. over the mixed-
    # annotation seed (tz canonicalization pin, streaming face)
    out = os.path.join(tdir, "changes")
    q = (spark.readStream.format("txlog_changes")
         .option("path", t.path).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(tdir, "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    ch = spark.read.parquet(out)
    # v0 (the CONVERT) is the base image — the feed starts at commit 1
    # (same contract as a native CREATE), so exactly the streamed
    # appends replay, one I per appended row, dt images included
    assert ch.filter(F.col("change_type") == "I").count() == 60
    assert ch.filter(F.col("user_id") >= 1000).filter(
        F.col("dt") != F.date_format("ts", "yyyy-MM-dd")).count() == 0
    assert t.fsck(deep=True) == []
