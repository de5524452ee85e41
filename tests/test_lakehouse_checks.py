"""CHECK constraint tests for the TxLog lakehouse format.

Enforcement contract: constraints are validated against the parquet a
write just LANDED (column-pruned read-back — the expensive merge join
never runs twice), BEFORE the commit publishes.  A violation deletes
the landed files and raises `CheckViolation`; the table never holds a
bad row and the version never advances.  SQL CHECK semantics: TRUE or
NULL passes, only IS FALSE violates.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import CheckViolation, TxLogTable


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_check_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mk(spark, path, checks, n=100):
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"))
    return TxLogTable.create(spark, path, df, "user_id", n_files=2,
                             checks=checks)


def csrc(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, value long, op string")


def test_create_rejects_violating_seed(spark, tdir):
    df = spark.range(0, 10).select(
        F.col("id").alias("user_id"), (F.col("id") - 5).alias("value"))
    with pytest.raises(CheckViolation, match="value_nonneg"):
        TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          checks={"value_nonneg": "value >= 0"})
    # nothing committed, nothing landed
    t = TxLogTable(spark, os.path.join(tdir, "t"))
    assert t._versions() == []
    data = os.path.join(tdir, "t", "data")
    assert not os.path.isdir(data) or all(
        not os.listdir(os.path.join(data, s)) for s in os.listdir(data))


def test_merge_violation_aborts_without_commit(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"),
           {"value_nonneg": "value >= 0"})
    v0 = t.snapshot().version
    before = {r["user_id"]: r["value"] for r in t.read().collect()}
    with pytest.raises(CheckViolation, match="value_nonneg"):
        t.merge(csrc(spark, [(5, -1, "U")]), op_col="op")
    snap = t.snapshot()
    assert snap.version == v0
    assert {r["user_id"]: r["value"]
            for r in t.read().collect()} == before
    assert t.fsck() == []
    # the rejected write dir was cleaned up immediately (no orphans)
    live_dirs = {p.split(os.sep)[1] for p in snap.files}
    disk_dirs = set(os.listdir(os.path.join(t.path, "data")))
    assert disk_dirs == live_dirs


def test_null_passes_sql_check_semantics(spark, tdir):
    df = spark.createDataFrame([(1, 10), (2, None)],
                               "user_id long, value long")
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          checks={"value_nonneg": "value >= 0"})
    assert t.read().count() == 2
    t.merge(csrc(spark, [(3, None, "I")]), op_col="op")  # NULL passes
    assert t.read().count() == 3


def test_add_check_validates_existing_and_enforces_future(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"), None)
    t.merge(csrc(spark, [(5, -7, "U")]), op_col="op")    # bad row in
    with pytest.raises(CheckViolation, match="value_nonneg"):
        t.add_check("value_nonneg", "value >= 0")
    t.merge(csrc(spark, [(5, 7, "U")]), op_col="op")     # repair
    t.add_check("value_nonneg", "value >= 0")
    assert "value_nonneg" in t.snapshot().checks
    with pytest.raises(CheckViolation):
        t.merge(csrc(spark, [(6, -1, "U")]), op_col="op")
    t.drop_check("value_nonneg")
    t.merge(csrc(spark, [(6, -1, "U")]), op_col="op")    # now allowed
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got[6] == -1
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_check("value_nonneg")


def test_checks_survive_checkpoint_replay(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"),
           {"value_nonneg": "value >= 0", "uid_cap": "user_id < 10000"})
    snap = t.snapshot()
    t._write_checkpoint(snap)
    replayed = t.snapshot(snap.version)
    assert replayed.checks == snap.checks
    assert t.detail()["checks"] == snap.checks
    with pytest.raises(CheckViolation, match="uid_cap"):
        t.merge(csrc(spark, [(20000, 1, "I")]), op_col="op")


def test_rename_and_drop_refuse_constrained_column(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"),
           {"value_nonneg": "value >= 0"})
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.rename_column("value", "amount")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.drop_column("value")
    t.drop_check("value_nonneg")
    t.rename_column("value", "amount")                   # now fine
    assert "amount" in t.read().columns


def test_checks_compose_with_partitioning_and_blooms(spark, tdir):
    """Constraint on the PARTITION column exercises the hive re-attach
    path of the validation scan (values live in dir names, re-typed by
    the explicit schema); blooms prove the landed-file re-scan and the
    sidecar build coexist on one write."""
    df = spark.range(0, 60).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"),
        F.concat(F.lit("c"), (F.col("id") % 3).cast("string"))
         .alias("cat"))
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), df, "user_id", n_files=2,
        partition_by=["cat"], key_bloom_bits=10,
        checks={"cat_known": "cat IN ('c0', 'c1', 'c2')",
                "value_nonneg": "value >= 0"})
    src = spark.createDataFrame([(3, 6, "c9", "U")],
                                "user_id long, value long, cat string, "
                                "op string")
    with pytest.raises(CheckViolation, match="cat_known"):
        t.merge(src, op_col="op")
    ok = spark.createDataFrame([(3, 6, "c1", "U")],
                               "user_id long, value long, cat string, "
                               "op string")
    t.merge(ok, op_col="op")
    assert t.fsck(deep=True) == []


def test_constraint_name_and_expr_validated_at_create(spark, tdir):
    df = spark.range(3).select(F.col("id").alias("user_id"),
                               F.col("id").alias("value"))
    with pytest.raises(ValueError, match="identifier"):
        TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          checks={"bad name": "value >= 0"})
    with pytest.raises(Exception):     # unresolvable column
        TxLogTable.create(spark, os.path.join(tdir, "t2"), df,
                          "user_id", checks={"c": "nope >= 0"})


def test_widening_merge_still_enforces_checks(spark, tdir):
    """A merge whose source ADDS a column rebuilds the working
    snapshot for the schema-widening commit; that rebuild must carry
    `checks` forward — a positional Snapshot reconstruction once
    dropped them, silently committing a constraint-violating row on
    exactly (and only) widening merges."""
    t = mk(spark, os.path.join(tdir, "t"),
           {"value_nonneg": "value >= 0"})
    v0 = t.snapshot().version
    src = spark.createDataFrame(
        [(5, -7, "new", "U")],
        "user_id long, value long, extra string, op string")
    with pytest.raises(CheckViolation, match="value_nonneg"):
        t.merge(src, op_col="op")
    snap = t.snapshot()
    assert snap.version == v0                      # nothing committed
    assert "extra" not in t.read().columns         # DDL not published
    assert t.read().filter(F.col("value") < 0).count() == 0
    # a VALID widening merge commits, keeps the constraint live
    ok = spark.createDataFrame(
        [(5, 7, "new", "U")],
        "user_id long, value long, extra string, op string")
    t.merge(ok, op_col="op")
    assert t.snapshot().checks == {"value_nonneg": "value >= 0"}
    with pytest.raises(CheckViolation, match="value_nonneg"):
        t.merge(spark.createDataFrame(
            [(6, -1, "x", "U")],
            "user_id long, value long, extra string, op string"),
            op_col="op")


def test_backticked_check_expr_blocks_rename_drop(spark, tdir):
    """A CHECK written with backtick-quoted identifiers (`value` >= 0)
    references the column exactly as the unquoted form does — rename/
    drop must refuse it too, or the constraint is orphaned and every
    later write fails resolving the old name."""
    t = mk(spark, os.path.join(tdir, "t"),
           {"value_nonneg": "`value` >= 0"})
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.rename_column("value", "amount")
    with pytest.raises(ValueError, match="referenced by CHECK"):
        t.drop_column("value")
    t.drop_check("value_nonneg")
    t.rename_column("value", "amount")
    assert "amount" in t.read().columns
