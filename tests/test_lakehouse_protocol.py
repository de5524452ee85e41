"""Protocol versioning (Delta-style reader/writer floors).

The format-evolution contract: a table's meta can raise
[min_reader, min_writer]; a client whose READER_VERSION is below the
floor refuses even to build a snapshot (mis-reading is corruption), a
client whose WRITER_VERSION is below refuses every mutation INCLUDING
vacuum (an old client must never destroy files under reachability
rules a newer protocol may have changed) while reads keep working.
Old logs carry no protocol key and read as [1, 1], so the feature is
zero-cost for every existing table.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import (
    READER_VERSION,
    WRITER_VERSION,
    TxLogTable,
    UnsupportedProtocolError,
)

# the smallest floors that lock THIS client out
LOCKOUT = WRITER_VERSION + 1
LOCKOUT_R = READER_VERSION + 1


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_proto_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mk(spark, path, n=40):
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"))
    return TxLogTable.create(spark, path, df, "user_id", n_files=2)


def src(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, value long, op string")


def test_default_protocol_and_noop_upgrade(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    assert t.snapshot().protocol == [1, 1]
    assert t.detail()["protocol"] == {"min_reader": 1, "min_writer": 1}
    v = t.snapshot().version
    r = t.upgrade_protocol(min_reader=1, min_writer=1)
    assert r["skipped"] and t.snapshot().version == v  # no empty commit
    assert t.fsck() == []


def test_writer_floor_blocks_every_mutation_reads_work(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    before = sorted(r["user_id"] for r in t.read().collect())
    t.upgrade_protocol(min_writer=LOCKOUT, allow_unsupported=True)
    assert t.snapshot().protocol == [1, LOCKOUT]
    # reads keep working
    assert sorted(r["user_id"] for r in t.read().collect()) == before
    assert t.detail()["protocol"]["min_writer"] == LOCKOUT
    assert t.fsck(deep=True) == []
    # every mutator refuses, table bytes untouched
    s = src(spark, [(1, 99, "U")])
    for op in (lambda: t.merge(s, op_col="op"),
               lambda: t.append(s.drop("op")),
               lambda: t.delete_where((0, 5)),
               lambda: t.optimize(),
               lambda: t.restore(version=0),
               lambda: t.rename_column("value", "v2"),
               lambda: t.drop_column("value"),
               lambda: t.add_check("c", "value >= 0"),
               lambda: t.repartition_layout(None),
               lambda: t.vacuum(min_age_s=0),
               lambda: t.upgrade_protocol(min_writer=LOCKOUT + 1,
                                          allow_unsupported=True)):
        with pytest.raises(UnsupportedProtocolError):
            op()
    assert sorted(r["user_id"] for r in t.read().collect()) == before


def test_reader_floor_blocks_head_not_history(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    v0 = t.snapshot().version
    t.merge(src(spark, [(1, 99, "U")]), op_col="op")
    t.upgrade_protocol(min_reader=LOCKOUT_R, allow_unsupported=True)
    with pytest.raises(UnsupportedProtocolError, match="min_reader"):
        t.snapshot()
    with pytest.raises(UnsupportedProtocolError):
        t.read().collect()
    # time travel BELOW the upgrade commit still replays fine
    old = t.read(version=v0)
    assert sorted(r["value"] for r in old.collect()) == \
        [i * 2 for i in range(40)]


def test_upgrade_is_monotonic_and_guarded(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    # exceeding own support requires the explicit flag
    with pytest.raises(ValueError, match="allow_unsupported"):
        t.upgrade_protocol(min_writer=LOCKOUT)
    t.upgrade_protocol(min_reader=1, min_writer=1)     # no-op ok
    t2 = TxLogTable(spark, t.path)
    t2.upgrade_protocol(min_writer=LOCKOUT, allow_unsupported=True)
    # downgrade refused even via a fresh handle... but the writer gate
    # fires first (the table is now write-locked for this client)
    with pytest.raises(UnsupportedProtocolError):
        TxLogTable(spark, t.path).upgrade_protocol(
            min_writer=WRITER_VERSION, allow_unsupported=True)


def test_protocol_survives_checkpoint_replay(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.upgrade_protocol(min_writer=LOCKOUT, allow_unsupported=True)
    snap = t.snapshot()
    t._write_checkpoint(snap)
    fresh = TxLogTable(spark, t.path)          # new handle, replays log
    replayed = fresh.snapshot(snap.version)
    assert replayed.protocol == [1, LOCKOUT]
    with pytest.raises(UnsupportedProtocolError):
        fresh.merge(src(spark, [(1, 1, "U")]), op_col="op")


def test_restore_never_rewinds_protocol(spark, tdir):
    """RESTORE re-points files/schema at an old version but the
    protocol floor must NOT rewind with it — otherwise a restore would
    silently re-admit old writers the upgrade locked out."""
    t = mk(spark, os.path.join(tdir, "t"))
    v0 = t.snapshot().version
    t.merge(src(spark, [(5, -1, "U")]), op_col="op")
    # a supported upgrade is impossible to distinguish at [1,1] (only
    # floor), so raise reader floor only — writes stay allowed
    t.upgrade_protocol(min_reader=1, min_writer=1)
    t.restore(version=v0)
    assert t.snapshot().protocol == [1, 1]
    # and explicitly: a restore below a writer upgrade keeps the floor
    t.upgrade_protocol(min_writer=LOCKOUT, allow_unsupported=True)
    with pytest.raises(UnsupportedProtocolError):
        t.restore(version=v0)
