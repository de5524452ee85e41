"""Partition-column (hive layout) format invariants for TxLogTable.

`create(partition_by=[...])` writes hive-style `col=value` directories,
records per-file typed partition values in the manifest, prunes reads
at the manifest by exact value, and re-attaches the columns (which the
parquet bytes lack, per hive convention) as typed literals at the scan
edge.  These tests pin that contract across every write path — create,
append, merge, delete (COW and DV), OPTIMIZE, ZORDER — plus column
mapping, the change feed, the streaming source, checkpoint replay, and
fsck coherence.
"""
from __future__ import annotations

import glob
import json
import os
import re
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import TxLogTable


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_part_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def make_ptable(spark, path, n=120, n_files=4, partition_by=("cat",)):
    df = (spark.range(0, n)
          .select(F.col("id").alias("user_id"),
                  (F.col("id") * 2).alias("value"),
                  F.concat(F.lit("c"), (F.col("id") % 3).cast("string"))
                  .alias("cat")))
    return TxLogTable.create(spark, path, df, "user_id",
                             n_files=n_files,
                             partition_by=list(partition_by)), df


def psrc(spark, rows):
    """rows = [(user_id, value, cat, op), ...]"""
    return spark.createDataFrame(
        rows, "user_id long, value long, cat string, op string")


def hive_dirs(path):
    return sorted({os.path.basename(os.path.dirname(f))
                   for f in glob.glob(os.path.join(
                       path, "data", "*", "*", "*.parquet"))})


def test_create_layout_roundtrip_and_manifest(spark, tdir):
    t, df = make_ptable(spark, os.path.join(tdir, "t"))
    # hive layout on disk; partition columns stripped from the bytes
    assert hive_dirs(t.path) == ["cat=c0", "cat=c1", "cat=c2"]
    got = t.read()
    assert sorted(got.columns) == ["cat", "user_id", "value"]
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, df.collect()))
    snap = t.snapshot()
    assert snap.partition_by == ["cat"]
    for rel, s in snap.files.items():
        # manifest value matches the path, and the file's parquet
        # schema does NOT contain the partition column
        assert s["partition"]["cat"] == \
            rel.split("cat=")[1].split("/")[0]
        import pyarrow.parquet as pq
        names = pq.ParquetFile(t._abs(rel)).schema_arrow.names
        assert "cat" not in names and "user_id" in names


def test_partition_pruning_is_manifest_exact(spark, tdir):
    t, df = make_ptable(spark, os.path.join(tdir, "t"))
    snap = t.snapshot()
    c1_files = [p for p, s in snap.files.items()
                if s["partition"]["cat"] == "c1"]
    assert 0 < len(c1_files) < len(snap.files)
    got = t.read(where_between=("cat", "c1", "c1"))
    want = df.filter(F.col("cat") == "c1")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # the pruned plan reads ONLY the c1 files
    scanned = [p for p in got.inputFiles()]
    assert sorted(os.path.relpath(p.removeprefix("file:"), t.path)
                  for p in scanned) == sorted(c1_files)
    # a value outside every partition reads zero files, zero rows
    assert t.read(where_between=("cat", "zz", "zz")).count() == 0


def test_escaped_and_unicode_partition_values(spark, tdir):
    vals = ["a/b", "x=y", "sp ace", "ünïcode", "100%"]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "user_id long, cat string")
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", partition_by=["cat"])
    got = sorted(map(tuple, t.read().collect()))
    assert got == sorted((i, v) for i, v in enumerate(vals))
    # pruning and DV deletes survive the %XX round trip
    assert t.read(where_between=("cat", "a/b", "a/b")).count() == 1
    t.delete_where((0, 0), mode="dv")        # key 0 lives in cat=a/b
    assert sorted(r["cat"] for r in t.read().collect()) == \
        sorted(vals[1:])
    assert t.fsck(deep=True) == []


def test_int_partition_column_typed_roundtrip(spark, tdir):
    df = (spark.range(0, 60)
          .select(F.col("id").alias("user_id"),
                  (F.col("id") % 4).alias("bucket")))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", partition_by=["bucket"])
    got = t.read()
    assert dict(got.dtypes)["bucket"] == "bigint"
    assert got.filter(F.col("bucket") == 2).count() == 15
    # range pruning over int partition values
    snap = t.snapshot()
    kept = [p for p, s in snap.files.items()
            if 1 <= s["partition"]["bucket"] <= 2]
    pruned = t.read(where_between=("bucket", 1, 2))
    assert pruned.count() == 30
    assert sorted(os.path.relpath(p.removeprefix("file:"), t.path)
                  for p in pruned.inputFiles()) == sorted(kept)


def test_multi_column_partitioning(spark, tdir):
    df = (spark.range(0, 80)
          .select(F.col("id").alias("user_id"),
                  F.concat(F.lit("t"), (F.col("id") % 2).cast("string"))
                  .alias("table_name"),
                  F.concat(F.lit("2026-01-0"),
                           ((F.col("id") % 4) + 1).cast("string"))
                  .alias("dt"),
                  F.col("id").alias("value")))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          partition_by=["table_name", "dt"])
    # nested hive layout data/<wid>/table_name=.../dt=.../part-*
    nested = glob.glob(os.path.join(
        t.path, "data", "*", "table_name=*", "dt=*", "*.parquet"))
    assert nested
    assert sorted(map(tuple, t.read().collect())) == \
        sorted(map(tuple, df.collect()))
    one_day = t.read(where_between=("dt", "2026-01-02", "2026-01-02"))
    assert one_day.count() == 20
    assert all("dt=2026-01-02" in p for p in one_day.inputFiles())


def test_null_and_invalid_partition_values_rejected(spark, tdir):
    base = spark.range(0, 10).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") < 3, None).otherwise(F.lit("a")).alias("cat"))
    with pytest.raises(ValueError, match="NULL or empty"):
        TxLogTable.create(spark, os.path.join(tdir, "null"), base,
                          "user_id", partition_by=["cat"])
    empty = spark.range(0, 4).select(
        F.col("id").alias("user_id"), F.lit("").alias("cat"))
    with pytest.raises(ValueError, match="NULL or empty"):
        TxLogTable.create(spark, os.path.join(tdir, "empty"), empty,
                          "user_id", partition_by=["cat"])


def test_partition_by_validation(spark, tdir):
    df = spark.range(0, 4).select(
        F.col("id").alias("user_id"), F.lit("a").alias("cat"),
        (F.col("id") * 1.5).alias("score"))
    with pytest.raises(ValueError, match="not in"):
        TxLogTable.create(spark, os.path.join(tdir, "a"), df,
                          "user_id", partition_by=["nope"])
    with pytest.raises(ValueError, match="key column"):
        TxLogTable.create(spark, os.path.join(tdir, "b"), df,
                          "user_id", partition_by=["user_id"])
    with pytest.raises(ValueError, match="type"):
        TxLogTable.create(spark, os.path.join(tdir, "c"), df,
                          "user_id", partition_by=["score"])


def test_merge_upsert_and_partition_move(spark, tdir):
    t, _ = make_ptable(spark, os.path.join(tdir, "t"))
    # k=9 is cat=c0 (9%3=0); move it to c2, insert k=500 in c1,
    # delete k=30
    t.merge(psrc(spark, [(9, -9, "c2", "U"), (500, 7, "c1", "I"),
                         (30, 0, "c0", "D")]), op_col="op")
    got = t.read()
    assert got.count() == 120
    moved = got.filter("user_id = 9").collect()[0]
    assert (moved["cat"], moved["value"]) == ("c2", -9)
    assert got.filter("user_id = 500").collect()[0]["cat"] == "c1"
    assert got.filter("user_id = 30").count() == 0
    # layout invariant: every rewritten file still lives in a single
    # hive dir that matches its manifest value
    assert t.fsck(deep=True) == []
    # the moved row is readable through partition pruning on its NEW
    # value and absent under the old one
    assert t.read(where_between=("cat", "c2", "c2")) \
        .filter("user_id = 9").count() == 1
    assert t.read(where_between=("cat", "c0", "c0")) \
        .filter("user_id = 9").count() == 0


def test_append_and_widening_on_partitioned_table(spark, tdir):
    t, df = make_ptable(spark, os.path.join(tdir, "t"), n=30)
    extra = (spark.range(100, 130)
             .select(F.col("id").alias("user_id"),
                     (F.col("id") * 2).alias("value"),
                     F.lit("c9").alias("cat"),
                     F.lit(1).alias("flag")))
    t.append(extra)
    got = t.read()
    assert got.count() == 60
    assert "cat=c9" in hive_dirs(t.path)
    assert got.filter("flag = 1").count() == 30
    assert got.filter("flag IS NULL").count() == 30
    assert t.fsck(deep=True) == []


def test_delete_optimize_zorder_preserve_layout(spark, tdir):
    t, df = make_ptable(spark, os.path.join(tdir, "t"), n=200,
                        n_files=6)
    t.delete_where((0, 20))                       # COW rewrite
    t.delete_where((100, 110), mode="dv")         # merge-on-read
    assert t.read().count() == 200 - 21 - 11
    before = sorted(map(tuple, t.read().collect()))
    res = t.optimize(target_files=2)
    assert not res["skipped"]
    assert sorted(map(tuple, t.read().collect())) == before
    # compaction kept the hive layout and purged the DVs
    snap = t.snapshot()
    assert all("partition" in s for s in snap.files.values())
    assert not any(s.get("dv") for s in snap.files.values())
    res2 = t.optimize(zorder_by=("value", "user_id"))
    assert sorted(map(tuple, t.read().collect())) == before
    assert t.fsck(deep=True) == []


def test_rename_partition_column_is_meta_only(spark, tdir):
    t, df = make_ptable(spark, os.path.join(tdir, "t"), n=30)
    dirs_before = hive_dirs(t.path)
    t.rename_column("cat", "category")
    assert hive_dirs(t.path) == dirs_before    # zero files touched
    got = t.read(where_between=("category", "c1", "c1"))
    assert "category" in got.columns
    assert got.count() == 10
    # merge under the new logical name still routes to the old dirs
    t.merge(spark.createDataFrame(
        [(500, 1, "c1")], "user_id long, value long, category string"))
    assert t.read().filter("user_id = 500").collect()[0]["category"] \
        == "c1"
    with pytest.raises(ValueError, match="partition column"):
        t.drop_column("category")
    assert t.fsck(deep=True) == []


def test_time_travel_and_cdf_carry_partition_values(spark, tdir):
    t, df = make_ptable(spark, os.path.join(tdir, "t"), n=30)
    t.merge(psrc(spark, [(3, -3, "c2", "U"), (900, 1, "c0", "I")]),
            op_col="op")
    # version 0 still shows the pre-merge row with its partition value
    v0 = t.read(version=0).filter("user_id = 3").collect()[0]
    assert (v0["cat"], v0["value"]) == ("c0", 6)
    ch = {(r["change_type"], r["user_id"]): r
          for r in t.table_changes(0, 1).collect()}
    assert ch[("U", 3)]["cat"] == "c2"
    assert ch[("I", 900)]["cat"] == "c0"


def test_checkpoint_replay_preserves_partitioning(spark, tdir):
    t, _ = make_ptable(spark, os.path.join(tdir, "t"), n=40)
    for i in range(12):    # cross the CHECKPOINT_EVERY=10 boundary
        t.merge(psrc(spark, [(i, 1000 + i, "c1", "U")]), op_col="op")
    assert t._checkpoints()
    fresh = TxLogTable(spark, t.path)
    snap = fresh.snapshot()
    assert snap.partition_by == ["cat"]
    assert fresh.read(where_between=("cat", "c1", "c1")).count() > 0
    assert fresh.fsck(deep=True) == []


def test_fsck_detects_partition_incoherence(spark, tdir):
    t, _ = make_ptable(spark, os.path.join(tdir, "t"), n=30)
    assert t.fsck() == []
    # corrupt one add-action's manifest partition value
    log0 = os.path.join(t.log_dir, sorted(os.listdir(t.log_dir))[0])
    lines = open(log0).read().splitlines()
    out = []
    broke = False
    for ln in lines:
        a = json.loads(ln)
        if "add" in a and not broke:
            a["add"]["partition"]["cat"] = "WRONG"
            broke = True
        out.append(json.dumps(a, sort_keys=True))
    os.chmod(log0, 0o644)
    with open(log0, "w") as f:
        f.write("\n".join(out) + "\n")
    assert broke
    findings = t.fsck()
    assert any("path partition" in msg for msg in findings)


def test_stream_cdf_matches_batch_on_partitioned_table(spark, tdir):
    """The streaming change reader re-attaches hive partition values
    on executors (pandas path) — pin it to the batch CDF over a
    mixed op sequence, same contract as the unpartitioned property
    test."""
    from cdc_plg_spark.sources.txlog_stream import TxLogChangesSource

    spark.dataSource.register(TxLogChangesSource)
    t, _ = make_ptable(spark, os.path.join(tdir, "t"), n=40)
    t.merge(psrc(spark, [(1, -1, "c2", "U"), (300, 5, "c1", "I")]),
            op_col="op")
    t.delete_where((10, 14), mode="dv")
    t.delete_where((20, 24))
    t.optimize(target_files=2)
    head = t.snapshot().version
    q = (spark.readStream.format("txlog_changes")
         .option("path", t.path).load()
         .writeStream.format("memory").queryName("cdf_part")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = sorted(
        (r["commit_version"], r["change_type"], r["user_id"],
         r["value"], r["cat"])
        for r in spark.sql("SELECT * FROM cdf_part").collect())
    batch = sorted(
        (r["_commit_version"], r["change_type"], r["user_id"],
         r["value"], r["cat"])
        for r in t.table_changes_per_commit(0, head).collect())
    assert streamed == batch and len(streamed) > 0
    # partition values present (not NULL) in the stream output
    assert all(x[4] is not None for x in streamed)


@pytest.mark.multijvm
def test_multiprocess_writer_race_partitioned(spark, tdir):
    """The multi-process writer torture on a PARTITIONED table: every
    merge also MOVES its rows across hive partition directories (the
    worker alternates bucket values per iteration), so a lost race on
    partition bookkeeping would surface as a manifest↔path mismatch
    (fsck), a phantom row in an old partition, or a lost update.
    Same serializability assertions as the unpartitioned soak."""
    import subprocess
    import sys as _sys

    path = os.path.join(tdir, "t")
    base = (spark.range(0, 50)
            .select(F.col("id").alias("user_id"),
                    (F.col("id") * 2).alias("value"),
                    F.concat(F.lit("b"), (F.col("id") % 3).cast("string"))
                    .alias("bucket")))
    TxLogTable.create(spark, path, base, "user_id", n_files=1,
                      partition_by=["bucket"])
    workers, iters = 3, 4
    script = os.path.join(os.path.dirname(__file__),
                          "_txlog_race_worker.py")
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [_sys.executable, script, path, str(w), str(iters), "part"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=tdir) for w in range(workers)]
    for w, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, \
            f"worker {w} rc={p.returncode}\n" \
            f"{_worker_failure_report(out)}"

    t = TxLogTable(spark, path)
    got = {r["user_id"]: (r["value"], r["bucket"])
           for r in t.read().collect()}
    expect = {k: (k * 2, f"b{k % 3}") for k in range(50)}  # base intact
    last = iters - 1
    for w in range(workers):            # last write wins, incl. bucket
        lo = 1000 + w * 100
        for k in range(20):
            expect[lo + k] = (w * 10000 + last, f"b{(lo + k + last) % 3}")
    assert got == expect
    versions = t._versions()
    assert versions == list(range(min(versions), max(versions) + 1))
    assert t.snapshot().version >= workers * iters
    # every live file on disk, in the directory its manifest claims
    assert t.fsck(deep=True) == []


def test_partition_pruning_measured_sf01(spark):
    """Measured I/O-reduction proof at sf0.1 (the small-fixture tests
    pin exactness; this pins the SCALE story): partition a ~100k-row
    events table 8 ways, and a single-partition predicate through the
    real pruned read path must touch ~1/8 of the files — counted via
    inputFiles(), not inferred — with rows identical to the
    full-scan filter."""
    from cdc_plg_spark.catalog import load_table

    ev = (load_table(spark, "events", "/root/testdata/sf0.1")
          .select("event_id", "user_id", "value",
                  F.pmod("user_id", F.lit(8)).alias("bucket")))
    d = tempfile.mkdtemp(prefix="part_sf01_")
    try:
        t = TxLogTable.create(spark, os.path.join(d, "t"), ev,
                              "event_id", n_files=16,
                              partition_by=["bucket"])
        total_files = len(t.snapshot().files)
        assert total_files >= 8
        got = t.read(where_between=("bucket", 3, 3))
        scanned = len(got.inputFiles())
        # manifest-exact prune: only bucket=3's files, never a footer
        # or data read elsewhere
        assert scanned <= total_files // 4, (scanned, total_files)
        want = sorted(r["event_id"] for r in
                      ev.filter(F.col("bucket") == 3).collect())
        assert sorted(r["event_id"] for r in got.collect()) == want
        print(f"partition prune: {scanned}/{total_files} files read")
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("pseed", [13, 37])
def test_random_ops_partitioned_match_dict_model(spark, tdir, pseed):
    """The randomized dict-model check on a PARTITIONED table: random
    MERGE (with partition-value moves and a partition value that never
    existed at create) / COW + DV DELETE / OPTIMIZE / VACUUM
    interleavings must keep head state == model (value AND partition
    value per key), every surviving historical version == its recorded
    model state, and the manifest↔path partition bookkeeping coherent
    (fsck) after every step."""
    import random

    rng = random.Random(pseed)
    t, _ = make_ptable(spark, os.path.join(tdir, "t"), n=40, n_files=4)
    model = {k: (k * 2, f"c{k % 3}") for k in range(40)}
    history = {0: dict(model)}
    horizon = 0

    def check_head():
        got = {r["user_id"]: (r["value"], r["cat"])
               for r in t.read().collect()}
        assert got == model
        assert t.fsck() == []

    for step in range(10):
        kind = rng.choices(("merge", "delete", "delete_dv",
                            "optimize", "vacuum"),
                           weights=(6, 1, 2, 1, 1))[0]
        if kind == "merge":
            keys = rng.sample(range(80), rng.randint(1, 6))
            rows, ops = [], {}
            for k in keys:
                op = rng.choice("IUD")
                v = rng.randint(-99, 99)
                cat = f"c{rng.randint(0, 3)}"   # c3 = post-create value
                rows.append((k, v, cat, op))
                ops[k] = (op, v, cat)
            m = t.merge(psrc(spark, rows), op_col="op")
            for k, (op, v, cat) in ops.items():
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = (v, cat)
            history[m["version"]] = dict(model)
        elif kind in ("delete", "delete_dv"):
            lo = rng.randint(0, 70)
            hi = lo + rng.randint(0, 20)
            dm = t.delete_where(
                (lo, hi), mode="dv" if kind == "delete_dv" else "cow")
            for k in list(model):
                if lo <= k <= hi:
                    del model[k]
            history[dm["version"]] = dict(model)
        elif kind == "optimize":
            m = t.optimize(target_files=2)
            if not m["skipped"]:
                history[m["version"]] = dict(model)
        else:
            vm = t.vacuum(retain_last=3, min_age_s=0)
            horizon = vm["horizon"]
        check_head()

    for v in t._versions():
        if v in history and v >= horizon:
            got = {r["user_id"]: (r["value"], r["cat"])
                   for r in t.read(version=v).collect()}
            assert got == history[v], f"version {v} diverged"


def _worker_failure_report(out: bytes) -> str:
    """Forensics-friendly failure text: the FIRST exception line (the
    3000-char tail used to cut off the exception class — observed in
    the r7 contention flake, where only mid-stack parquet frames
    survived) plus a generous tail."""
    txt = out.decode(errors="replace")
    first = next((ln for ln in txt.splitlines()
                  if re.search(r"(Exception|Error)\b", ln)), "")
    return f"first-error: {first}\n...\n{txt[-8000:]}"


def test_fsck_flags_native_file_at_segmentless_path(spark, tdir):
    """ADVICE r9: fsck used to skip the path/manifest cross-check for
    ANY path with zero k=v segments, so a native hive file externally
    moved (or re-manifested by a naive tool) at a segment-less path
    went unflagged.  Now only files carrying the `nonhive` add marker
    (non-hive converts, flattening deep clones) skip; a marker-less
    partitioned file must be fully hive self-describing."""
    t, _ = make_ptable(spark, os.path.join(tdir, "t"), n=30)
    assert t.fsck() == []
    snap = t.snapshot()
    victim = sorted(snap.files)[0]
    s = snap.files[victim]
    stray = os.path.join("data", "stray.parquet")
    shutil.copyfile(os.path.join(t.path, victim),
                    os.path.join(t.path, stray))
    assert t._try_commit(snap.version + 1, [
        {"commit": {"op": "WRITE"}},
        {"add": {"path": stray, "rows": s["rows"], "bytes": s["bytes"],
                 "min_key": s["min_key"], "max_key": s["max_key"],
                 "cols": s.get("cols", {}),
                 "partition": dict(s["partition"])}}])
    findings = t.fsck()
    assert any(stray in m and "externally moved" in m
               for m in findings), findings
    # the same add WITH the layout marker is a legitimate import
    snap2 = t.snapshot()
    stray2 = os.path.join("data", "stray2.parquet")
    shutil.copyfile(os.path.join(t.path, victim),
                    os.path.join(t.path, stray2))
    assert t._try_commit(snap2.version + 1, [
        {"commit": {"op": "WRITE"}},
        {"add": {"path": stray2, "rows": s["rows"],
                 "bytes": s["bytes"], "min_key": s["min_key"],
                 "max_key": s["max_key"], "cols": s.get("cols", {}),
                 "partition": dict(s["partition"]),
                 "nonhive": True}}])
    assert not any(stray2 in m for m in t.fsck())
