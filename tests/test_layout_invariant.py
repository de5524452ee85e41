"""The content-untouched publish gate on pure-layout transactions
(r11 VERDICT task 3, reacting to the r11 `lakehouse_sql_convert_layout`
hash flake — one driver red in 32+ otherwise-green executions).

REPARTITION and OPTIMIZE promise "bytes move, values don't".  That
promise is now a checkable contract: `_verify_layout_rewrite`
fingerprints the rewrite's input and its read-back (through the same
manifest-tuple read path every future reader uses) and REFUSES the
commit on mismatch — a lost, duplicated, or partition-mis-attributed
row raises LayoutInvariantViolation instead of publishing.

Three corruption injections prove the gate actually fires (dropped
row, duplicated row, mis-attached partition tuple — the three ways a
layout op can silently change values), and a perturbed-job-history
sweep pins the r11 flake's suspected mechanism: RangePartitioner's
sample seed derives from RDD ids, so `_write_data`'s
repartitionByRange layout varies with how many jobs the session ran
before — values must not.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import (LayoutInvariantViolation,
                                     TxLogTable)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_inv_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mk(spark, path, n=120, **kw):
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value"),
        F.concat(F.lit("c"), (F.col("id") % 4).cast("string"))
         .alias("cat"))
    return TxLogTable.create(spark, path, df, "user_id", n_files=3,
                             **kw)


def content(t):
    return {r["user_id"]: (r["value"], r["cat"])
            for r in t.read().collect()}


def _corrupt_write(t, mode):
    """Monkeypatch `_write_data` to corrupt its input df — the
    injection point sits BELOW the gate, exactly where a real rewrite
    bug would live."""
    orig = t._write_data

    def bad(df, key_col, n_files=None, cluster_expr=None, **kw):
        if mode == "drop":
            df = df.filter(F.col("user_id") != 7)
        elif mode == "dup":
            df = df.unionAll(df.filter(F.col("user_id") == 7))
        adds = orig(df, key_col, n_files, cluster_expr, **kw)
        if mode == "misattach":
            # swap one file's manifest partition tuple: the bytes are
            # right, the ATTRIBUTION is wrong — the failure class the
            # convert_layout exhibit's docstring names
            for a in adds:
                p = (a["add"].get("partition") or {}).get("cat")
                if p == "c1":
                    a["add"]["partition"]["cat"] = "c2"
                    break
        return adds

    t._write_data = bad


@pytest.mark.parametrize("mode", ["drop", "dup", "misattach"])
def test_corrupt_repartition_refused(spark, tdir, mode):
    t = mk(spark, os.path.join(tdir, "t"))
    before = content(t)
    v0 = t.snapshot().version
    _corrupt_write(t, mode)
    with pytest.raises(LayoutInvariantViolation, match="REPARTITION"):
        t.repartition_layout(["cat"], target_files=3)
    # nothing published: same version, same values, old files live
    assert t.snapshot().version == v0
    assert content(t) == before
    # the refused rewrite's files were deleted, not left as orphans
    data_root = os.path.join(t.path, "data")
    write_dirs = sorted(os.listdir(data_root))
    live_dirs = {p.split("/")[1] for p in t.snapshot().files}
    assert set(write_dirs) == live_dirs


def test_corrupt_optimize_refused(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    before = content(t)
    v0 = t.snapshot().version
    _corrupt_write(t, "drop")
    with pytest.raises(LayoutInvariantViolation, match="OPTIMIZE"):
        t.optimize(small_bytes=1 << 30, verify=True)
    assert t.snapshot().version == v0
    assert content(t) == before


def test_clean_repartition_and_optimize_pass_gate(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    before = content(t)
    m = t.repartition_layout(["cat"], target_files=3)  # verify=True
    assert not m["skipped"]
    assert content(t) == before
    m2 = t.optimize(small_bytes=1 << 30, verify=True)
    assert not m2["skipped"]
    assert content(t) == before
    assert t.fsck() == []


def test_exhibit_values_stable_under_perturbed_job_history(spark):
    """The r11 flake pin (VERDICT task 1): run the convert_layout
    exhibit's exact dataflow under PERTURBED session job history —
    burning a varying number of dummy jobs between stages shifts
    RangePartitioner's RDD-id-derived sample seed, so the rewrite's
    file boundaries differ per iteration — and diff VALUES each time.
    sf0.001 keeps the sweep cheap; the boundary mechanism is
    row-count-independent."""
    from cdc_plg_spark.catalog import load_table
    from cdc_plg_spark.lakehouse_sql import run_sql

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, "documents", sf) \
        .select("doc_id", "lang", "source", "n_chars")
    expected = {tuple(r[:2]): tuple(r[2:]) for r in
                docs.groupBy("lang", "source")
                .agg(F.count("*").alias("n"),
                     F.sum("n_chars").alias("sc"),
                     F.sum("doc_id").alias("ic")).collect()}
    for it in range(4):
        for b in range(it):      # perturb the RDD-id counter
            spark.range(50 + b).repartition(3).count()
        raw = os.path.join(tempfile.mkdtemp(prefix="lh_inv_"), "t")
        docs.repartition(4, F.col("doc_id")).write.parquet(raw)
        run_sql(spark, f"CONVERT TO TXLOG '{raw}' KEY doc_id")
        run_sql(spark, f"ALTER TXLOG '{raw}' REPARTITION BY (lang) "
                       f"TARGET FILES 4")
        run_sql(spark, f"CREATE OR REPLACE TEMP VIEW lh_inv_v "
                       f"AS TXLOG '{raw}'")
        got = {tuple(r[:2]): tuple(r[2:]) for r in spark.sql(
            "SELECT lang, source, COUNT(*), SUM(n_chars), SUM(doc_id) "
            "FROM lh_inv_v GROUP BY lang, source").collect()}
        assert got == expected, f"iteration {it} changed values"
        shutil.rmtree(os.path.dirname(raw), ignore_errors=True)
