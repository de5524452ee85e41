"""TYPE WIDENING (`widen_column_type`) — lossless widening as a pure
meta commit, behind reader protocol 2.

Contract under test:
- widening is METADATA-ONLY (file set untouched), old narrow files
  read back exactly under the widened schema (Spark footer up-cast);
- the lattice refuses every lossy/unsound edge (narrowing, int→float,
  partition columns, generated columns);
- the commit raises the protocol floor to [2, 2]: a v1 READER is
  blocked at head but can still time-travel below the widening
  commit; a v1 writer is blocked from mutating;
- stats pruning, CHECK constraints, bloom sidecars (canonical hash
  domain), ingest conformance, checkpoint replay, and RESTORE across
  the widen all keep working.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import cdc_plg_spark.lakehouse as lh
from cdc_plg_spark.lakehouse import (
    TxLogTable,
    UnsupportedProtocolError,
)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_widen_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mk_int(spark, path, n=120, **kw):
    df = spark.range(0, n).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"),
        (F.col("id") / 4).cast("float").alias("score"))
    return TxLogTable.create(spark, path, df, "k", n_files=3, **kw)


def test_widen_is_metadata_only_and_reads_back_exact(spark, tdir):
    t = mk_int(spark, os.path.join(tdir, "t"))
    files0 = set(t.snapshot().files)
    want = {r["k"]: (r["v"], r["score"])
            for r in t.read().collect()}
    m = t.widen_column_type("v", "long")
    t.widen_column_type("score", "double")
    assert not m["skipped"] and m["from"] == "integer"
    snap = t.snapshot()
    assert set(snap.files) == files0            # zero data movement
    assert snap.protocol == [2, 2]
    sch = {f.name: f.dataType.typeName()
           for f in t.read().schema.fields}
    assert sch["v"] == "long" and sch["score"] == "double"
    got = {r["k"]: (r["v"], r["score"]) for r in t.read().collect()}
    assert got == want
    assert t.fsck(deep=True) == []              # footer stats still agree
    # no-op widen doesn't commit
    v = t.snapshot().version
    assert t.widen_column_type("v", "long")["skipped"]
    assert t.snapshot().version == v


def test_lattice_refusals(spark, tdir):
    t = mk_int(spark, os.path.join(tdir, "t"))
    for col, ty, msg in [
        ("v", "integer", None),                  # no-op, not an error
        ("v", "short", "lossless"),              # narrowing
        ("v", "double", "lossless"),             # int→float
        ("score", "long", "lossless"),           # float→int
        ("nope", "long", "no column"),
    ]:
        if msg is None:
            assert t.widen_column_type(col, ty)["skipped"]
        else:
            with pytest.raises(ValueError, match=msg):
                t.widen_column_type(col, ty)
    tp = TxLogTable.create(
        spark, os.path.join(tdir, "p"),
        spark.range(20).select(F.col("id").alias("k"),
                               (F.col("id") % 3).cast("int").alias("b")),
        "k", partition_by=["b"])
    with pytest.raises(ValueError, match="partition"):
        tp.widen_column_type("b", "long")
    tg = TxLogTable.create(
        spark, os.path.join(tdir, "g"),
        spark.range(20).select(
            F.col("id").alias("k"),
            F.to_timestamp(F.lit("2024-03-01")).alias("ts"),
            (F.col("id") * 10).cast("int").alias("v")),
        "k", generated={"yr": "year(ts)"})     # yr: integer
    with pytest.raises(ValueError, match="generated"):
        tg.widen_column_type("yr", "long")
    tg.widen_column_type("v", "long")      # a non-source int is fine
    tgr = tg.read()
    assert tgr.schema["v"].dataType.typeName() == "long"
    assert tgr.filter("yr <> 2024").count() == 0
    assert tg.fsck(deep=True) == []


def test_v1_reader_blocked_at_head_history_open(spark, tdir,
                                                monkeypatch):
    t = mk_int(spark, os.path.join(tdir, "t"))
    v0 = t.snapshot().version
    t.widen_column_type("v", "long")
    monkeypatch.setattr(lh, "READER_VERSION", 1)
    monkeypatch.setattr(lh, "WRITER_VERSION", 1)
    t1 = TxLogTable(spark, t.path)
    with pytest.raises(UnsupportedProtocolError, match="min_reader"):
        t1.read()
    # time travel BELOW the widening commit: all-narrow, still open
    old = t1.read(version=v0)
    assert old.schema["v"].dataType.typeName() == "integer"
    assert old.count() == 120


def test_ingest_after_widen_accepts_both_widths(spark, tdir):
    t = mk_int(spark, os.path.join(tdir, "t"))
    t.widen_column_type("v", "long")
    # narrow source: conformed up; wide source: native
    t.append(spark.createDataFrame(
        [(500, 7, 1.0)], "k int, v int, score float"))
    t.merge(spark.createDataFrame(
        [(501, 9_000_000_000, 2.0, "U")],
        "k int, v long, score float, op string"), op_col="op")
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[500] == 7 and got[501] == 9_000_000_000
    assert t.read().count() == 122
    assert t.fsck(deep=True) == []


def test_stats_pruning_stays_exact_across_widths(spark, tdir):
    """where_between on a widened column prunes against a manifest
    holding stats from BOTH narrow-written and wide-written files."""
    t = mk_int(spark, os.path.join(tdir, "t"), n=400)
    t.widen_column_type("v", "long")
    t.append(spark.range(400, 500).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).alias("v"),
        F.lit(0.0).cast("float").alias("score")))
    got = sorted(r["k"] for r in
                 t.read(where_between=("v", 100, 900)).collect())
    want = sorted(r["k"] for r in
                  t.read().filter(F.col("v").between(100, 900))
                  .collect())
    assert got == want and got


def test_bloomed_key_widening_keeps_membership_pruning(spark, tdir):
    """THE payoff of the canonical bloom hash domain: widening the KEY
    itself leaves every sidecar valid (built hashing int-cast-to-long,
    probed hashing long), so merges keep rewriting the right files —
    no duplicates, no lost updates."""
    df = spark.range(0, 300).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).alias("v"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "k",
                          n_files=4, key_bloom_bits=10)
    t.widen_column_type("k", "long")
    m = t.merge(spark.createDataFrame(
        [(5, -99, "U")], "k long, v long, op string"), op_col="op")
    assert m["files_scanned"] == 1
    rows = t.read().filter("k = 5").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(5, -99)]
    assert t.read().count() == 300
    assert len(t.read(key_between=(5, 5)).inputFiles()) == 1
    assert t.fsck(deep=True) == []


def test_checks_enforced_across_widen(spark, tdir):
    t = mk_int(spark, os.path.join(tdir, "t"),
               checks={"v_pos": "v >= 0"})
    t.widen_column_type("v", "long")
    with pytest.raises(lh.CheckViolation):
        t.append(spark.createDataFrame(
            [(900, -5, 0.0)], "k int, v long, score float"))
    assert t.read().count() == 120


def test_restore_across_widen_rewinds_schema_not_protocol(spark, tdir):
    t = mk_int(spark, os.path.join(tdir, "t"))
    v0 = t.snapshot().version
    t.widen_column_type("v", "long")
    t.append(spark.createDataFrame(
        [(800, 9_000_000_000, 0.0)], "k int, v long, score float"))
    t.restore(version=v0)
    snap = t.snapshot()
    assert snap.protocol == [2, 2]              # floor never rewinds
    assert StructType_v(t) == "integer"
    assert t.read().count() == 120              # wide file removed
    # post-restore the narrow contract is back: wide source refused
    with pytest.raises(ValueError, match="lossless"):
        t.append(spark.createDataFrame(
            [(801, 1, 0.0)], "k int, v long, score float"))
    assert t.fsck(deep=True) == []


def StructType_v(t):
    return t.read().schema["v"].dataType.typeName()


def test_checkpoint_replay_keeps_widened_schema(spark, tdir):
    t = mk_int(spark, os.path.join(tdir, "t"))
    t.widen_column_type("v", "long")
    snap = t.snapshot()
    t._write_checkpoint(snap)
    fresh = TxLogTable(spark, t.path)
    re_ = fresh.snapshot(snap.version)
    assert re_.protocol == [2, 2]
    sch = {f["name"]: f["type"] for f in
           __import__("json").loads(re_.schema_json)["fields"]}
    assert sch["v"] == "long"


def test_widen_on_converted_table(spark, tdir):
    """The realistic migration pair: CONVERT an existing foreign
    parquet directory by reference (zero rewrite), then WIDEN a column
    as the domain outgrows its type — still zero data movement, and
    the foreign narrow files read back exactly through the widened
    schema."""
    raw = os.path.join(tdir, "foreign")
    (spark.range(0, 200).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 3).cast("int").alias("v"))
     .repartition(3).write.parquet(raw))
    t = TxLogTable.convert(spark, raw, "k")
    files0 = set(t.snapshot().files)
    t.widen_column_type("v", "long")
    snap = t.snapshot()
    assert set(snap.files) == files0
    assert snap.protocol == [2, 2]
    got = t.read()
    assert got.schema["v"].dataType.typeName() == "long"
    assert {r["k"]: r["v"] for r in got.collect()} == \
        {k: k * 3 for k in range(200)}
    # ingest keeps working on the adopted-and-widened table
    t.merge(spark.createDataFrame(
        [(500, 9_000_000_000, "U")], "k int, v long, op string"),
        op_col="op")
    assert t.read().count() == 201
    assert t.fsck(deep=True) == []


def test_dv_delete_and_zorder_after_key_widening(spark, tdir):
    """The remaining write-path interactions with a widened KEY:
    merge-on-read deletes (DV keys recorded post-widen anti-join
    through the head LONG type against narrow files) and an OPTIMIZE
    ZORDER over mixed-width files (reads pin the head schema, the
    rewrite lands wide), ending in a clean deep fsck."""
    df = spark.range(0, 200).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("int").alias("v"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "k",
                          n_files=4)
    t.widen_column_type("k", "long")
    t.widen_column_type("v", "long")
    d = t.delete_where((10, 14), mode="dv")      # DV over narrow files
    assert d["files_dv"] >= 1 if "files_dv" in d else True
    assert t.read().count() == 195
    assert sorted(r["k"] for r in
                  t.read(key_between=(8, 16)).collect()) == \
        [8, 9, 15, 16]
    t.optimize(zorder_by=("k", "v"), target_files=2)  # mixed → wide
    assert t.read().count() == 195
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {k: k * 2 for k in range(200) if not 10 <= k <= 14}
    assert t.fsck(deep=True) == []


def test_widen_refused_when_generated_references_column(spark, tdir):
    """ADVICE r7 (high): widening a column that a GENERATED expression
    REFERENCES must be refused, mirroring rename/drop.  For a
    type-tracking generator (g = v + 1, g pinned INT at create),
    widening v to LONG would make every later ingest recompute g at
    LongType — _apply_generated_ingest runs AFTER _conform_types, so
    the computed column lands INT64 parquet under g's pinned INT read
    schema: the commit succeeds and all subsequent reads fail with
    PARQUET_COLUMN_DATA_TYPE_MISMATCH, the exact class _conform_types
    exists to prevent."""
    df = spark.range(0, 50).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).cast("int").alias("v"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "k",
                          generated={"g": "v + 1"})
    with pytest.raises(ValueError, match="reference"):
        t.widen_column_type("v", "long")
    # the table stays healthy and fully usable after the refusal
    t.append(spark.range(50, 60).select(
        F.col("id").alias("k"),
        (F.col("id") * 3).cast("int").alias("v")))
    got = t.read()
    assert got.count() == 60
    assert got.filter("g <> v + 1").count() == 0
    assert t.fsck(deep=True) == []
