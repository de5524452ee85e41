"""Generated columns (Delta-style `GENERATED ALWAYS AS`, fixed at
create) and the derived partition prune they unlock.

Contract under test:
- a generated column OMITTED by the caller is computed from its
  expression on every ingest (create/append/merge-insert);
- one SUPPLIED by the caller is validated (col <=> expr) against the
  landed bytes and the write aborts loudly on mismatch — never a
  silent override, never silent trust;
- merge RECOMPUTES the after-image, so a partial UPDATE that moves a
  source column moves the row's generated value (and hive partition)
  with it;
- a predicate on the SOURCE column of a monotone generated partition
  column prunes partitions at the manifest (no footer reads), and the
  result stays bit-identical to the unpruned filter;
- tables with generated columns carry protocol [1, 2]: a v1 writer is
  locked out of every mutation while reads keep working;
- the generated map survives checkpoint replay and RESTORE; rename/
  drop of the generated column or its sources is refused.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import cdc_plg_spark.lakehouse as lh
from cdc_plg_spark.lakehouse import (
    CheckViolation,
    TxLogTable,
    UnsupportedProtocolError,
    _monotone_generator,
)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_gen_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_BASE_US = int(dt.datetime(2024, 3, 1,
                           tzinfo=dt.timezone.utc).timestamp()) * 1_000_000


def events_df(spark, n=200, days=10):
    """n rows spread over `days` days of March 2024, long key."""
    return spark.range(0, n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(_BASE_US)
             + (F.col("id") % days) * F.lit(86_400_000_000)
             + (F.col("id") % 60) * F.lit(60_000_000)).cast("long")
        ).alias("ts"),
        (F.col("id") * 3).alias("value"))


GEN = {"event_date": "date_format(ts, 'yyyy-MM-dd')"}


def mk(spark, path, **kw):
    return TxLogTable.create(
        spark, path, events_df(spark), "event_id", n_files=4,
        partition_by=["event_date"], generated=GEN, **kw)


def test_create_computes_omitted_column_and_sets_protocol(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    snap = t.snapshot()
    assert snap.generated == GEN
    assert snap.protocol == [1, 2]
    assert t.detail()["generated"] == GEN
    assert t.fsck(deep=True) == []
    got = t.read().select("event_date",
                          F.date_format("ts", "yyyy-MM-dd").alias("want"))
    assert got.filter("event_date <> want").count() == 0
    assert t.read().count() == 200
    # hive layout keyed on the generated column
    assert t.detail()["num_partitions"] == 10


def test_create_validates_supplied_values(spark, tdir):
    df_ok = events_df(spark).withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd"))
    t = TxLogTable.create(spark, os.path.join(tdir, "ok"), df_ok,
                          "event_id", partition_by=["event_date"],
                          generated=GEN)
    assert t.read().count() == 200
    df_bad = events_df(spark).withColumn("event_date", F.lit("1999-01-01"))
    with pytest.raises(CheckViolation, match="_generated_event_date"):
        TxLogTable.create(spark, os.path.join(tdir, "bad"), df_bad,
                          "event_id", partition_by=["event_date"],
                          generated=GEN)
    assert not TxLogTable(spark, os.path.join(tdir, "bad"))._versions()


def test_create_rejects_bad_declarations(spark, tdir):
    df = events_df(spark)
    for gen, msg in [
        ({"event_date": "date_format(nope, 'yyyy-MM-dd')"}, "resolve"),
        ({"event_date": "uuid()"}, "non-deterministic"),
        ({"event_id": "value * 2"}, "cannot be generated"),
        ({"event_date": ""}, "non-empty"),
        ({"a b": "value"}, "identifier"),
        ({"d1": "year(ts)", "d2": "d1 + 1"}, "chaining"),
    ]:
        with pytest.raises(ValueError, match=msg):
            TxLogTable.create(spark, os.path.join(tdir, "x"), df,
                              "event_id", generated=gen)
    with pytest.raises(ValueError, match="reserved"):
        TxLogTable.create(spark, os.path.join(tdir, "x"), df, "event_id",
                          generated=GEN,
                          partition_by=["event_date"],
                          checks={"_generated_event_date": "value >= 0"})


def test_append_computes_and_validates(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    extra = spark.createDataFrame(
        [(1000, dt.datetime(2024, 4, 1, 12, 0), 7)],
        "event_id long, ts timestamp, value long")
    t.append(extra)     # omitted -> computed
    row = t.read(key_between=(1000, 1000)).collect()[0]
    assert row["event_date"] == "2024-04-01"
    bad = spark.createDataFrame(
        [(1001, dt.datetime(2024, 4, 3, 12, 0), 7, "2024-04-01")],
        "event_id long, ts timestamp, value long, event_date string")
    with pytest.raises(CheckViolation, match="_generated_event_date"):
        t.append(bad)
    assert t.read().count() == 201      # failed append left no rows


def test_merge_moves_row_across_partitions_on_partial_update(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    # partial merge ships ONLY (key, ts): event_date must follow ts
    src = spark.createDataFrame(
        [(5, dt.datetime(2024, 6, 15, 8, 0), "U")],
        "event_id long, ts timestamp, op string")
    t.merge(src, op_col="op", partial=True)
    row = t.read(key_between=(5, 5)).collect()[0]
    assert row["event_date"] == "2024-06-15"
    assert row["value"] == 15           # untouched column kept
    assert t.fsck(deep=True) == []      # path == manifest == data


def test_merge_insert_computes_and_bad_supplied_value_aborts(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    ins = spark.createDataFrame(
        [(2000, dt.datetime(2024, 7, 1), 1, "U")],
        "event_id long, ts timestamp, value long, op string")
    t.merge(ins, op_col="op", partial=True)
    assert t.read(key_between=(2000, 2000)).collect()[0]["event_date"] \
        == "2024-07-01"
    bad = ins.withColumn("event_id", F.lit(2001)) \
             .withColumn("event_date", F.lit("2020-01-01"))
    v = t.snapshot().version
    with pytest.raises(CheckViolation, match="generated column"):
        t.merge(bad, op_col="op", partial=True)
    assert t.snapshot().version == v
    # deletes are exempt: a tombstone's non-key values are irrelevant
    tomb = bad.withColumn("event_id", F.lit(2000)) \
              .withColumn("op", F.lit("D"))
    t.merge(tomb, op_col="op", partial=True)
    assert t.read(key_between=(2000, 2000)).count() == 0


def test_merge_source_with_gen_col_but_no_deps_is_refused(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    src = spark.createDataFrame(
        [(5, "2024-03-05", "U")], "event_id long, event_date string, op string")
    with pytest.raises(ValueError, match="source column"):
        t.merge(src, op_col="op", partial=True)


def test_derived_partition_prune_is_exact_and_prunes(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    lo, hi = dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 3, 23, 59)
    pruned = t.read(where_between=("ts", lo, hi))
    # exactness vs the full-scan filter
    want = sorted(r["event_id"] for r in
                  t.read().filter(F.col("ts").between(lo, hi)).collect())
    assert sorted(r["event_id"] for r in pruned.collect()) == want
    assert want                                    # non-trivial slice
    # and it actually pruned: count manifest files the read admitted
    snap = t.snapshot()
    admitted = {p for p, s in snap.files.items()
                if s["partition"]["event_date"] in
                ("2024-03-02", "2024-03-03")}
    scanned = {os.path.relpath(lh._fs_path(r[0]), t.path) for r in
               pruned.select(F.input_file_name()).distinct().collect()}
    assert scanned <= admitted
    assert len(scanned) < len(snap.files)


def test_prune_with_numeric_stat_domain_bounds(spark, tdir):
    """Raw epoch-micros bounds (the stat-domain calling convention the
    read path already supports) drive the derived prune too."""
    t = mk(spark, os.path.join(tdir, "t"))
    lo = int(dt.datetime(2024, 3, 2,
                         tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    hi = lo + 2 * 86_400_000_000 - 1
    got = sorted(r["event_id"] for r in
                 t.read(where_between=("ts", lo, hi)).collect())
    want = sorted(
        r["event_id"] for r in t.read().filter(
            F.col("ts").between(F.timestamp_micros(F.lit(lo)),
                                F.timestamp_micros(F.lit(hi)))).collect())
    assert got == want and got


def test_unrecognized_generator_skips_prune_but_stays_exact(spark, tdir):
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), events_df(spark), "event_id",
        n_files=4, partition_by=["dom"],
        generated={"dom": "day(ts)"})      # day-of-month: NOT monotone
    assert _monotone_generator("day(ts)") is None
    lo, hi = dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 4)
    got = sorted(r["event_id"] for r in
                 t.read(where_between=("ts", lo, hi)).collect())
    want = sorted(r["event_id"] for r in
                  t.read().filter(F.col("ts").between(lo, hi)).collect())
    assert got == want and got


def test_monotone_generator_recognizer():
    assert _monotone_generator("date_format(ts, 'yyyy-MM-dd')") == \
        ("ts", "date_format")
    assert _monotone_generator(" DATE_FORMAT( `ts` , 'yyyy-MM' ) ") == \
        ("ts", "date_format")
    assert _monotone_generator("date_format(ts, 'MM-dd')") is None
    assert _monotone_generator("year(ts)") == ("ts", "year")
    assert _monotone_generator("substring(name, 1, 3)") == \
        ("name", "prefix")
    assert _monotone_generator("substr(name, 2, 3)") is None
    assert _monotone_generator("floor(v / 100)") == ("v", "floor_div")
    assert _monotone_generator("floor(v / 0)") is None
    assert _monotone_generator("hash(ts)") is None
    assert _monotone_generator("month(ts)") is None


def test_year_and_floor_generators_prune(spark, tdir):
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.concat(
            (F.lit(2000) + (F.col("id") % 30)).cast("string"),
            F.lit("-06-01 00:00:00"))).alias("ts"),
        (F.col("id") * 10).alias("v"))
    t = TxLogTable.create(
        spark, os.path.join(tdir, "y"), df, "k", n_files=3,
        partition_by=["yr", "vb"],
        generated={"yr": "year(ts)", "vb": "floor(v / 1000)"})
    got = t.read(where_between=[("ts", "2005-01-01", "2007-12-31"),
                                ("v", 0, 1500)])
    want = (df.filter(F.col("ts").between("2005-01-01", "2007-12-31"))
              .filter(F.col("v").between(0, 1500)))
    assert sorted(r["k"] for r in got.collect()) == \
        sorted(r["k"] for r in want.collect())
    assert got.count() > 0
    # both derived prunes bit into the manifest
    snap = t.snapshot()
    scanned = {os.path.relpath(lh._fs_path(r[0]), t.path) for r in
               got.select(F.input_file_name()).distinct().collect()}
    ok_parts = {p for p, s in snap.files.items()
                if 2005 <= s["partition"]["yr"] <= 2007
                and 0 <= s["partition"]["vb"] <= 1}
    assert scanned <= ok_parts
    assert len(ok_parts) < len(snap.files)


def test_old_writer_locked_out_reads_work(spark, tdir, monkeypatch):
    t = mk(spark, os.path.join(tdir, "t"))
    before = t.read().count()
    monkeypatch.setattr(lh, "WRITER_VERSION", 1)   # simulate a v1 client
    t1 = TxLogTable(spark, t.path)
    assert t1.read().count() == before             # reads stay open
    extra = spark.createDataFrame(
        [(9999, dt.datetime(2024, 5, 1), 0)],
        "event_id long, ts timestamp, value long")
    for op in (lambda: t1.append(extra),
               lambda: t1.merge(extra.withColumn("op", F.lit("U")),
                                op_col="op", partial=True),
               lambda: t1.vacuum(min_age_s=0),
               lambda: t1.optimize()):
        with pytest.raises(UnsupportedProtocolError):
            op()
    assert t1.read().count() == before


def test_generated_survives_checkpoint_and_restore(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    v0 = t.snapshot().version
    extra = spark.createDataFrame(
        [(3000, dt.datetime(2024, 8, 1), 4)],
        "event_id long, ts timestamp, value long")
    t.append(extra)
    snap = t.snapshot()
    t._write_checkpoint(snap)
    fresh = TxLogTable(spark, t.path)
    assert fresh.snapshot(snap.version).generated == GEN
    fresh.restore(version=v0)
    after = fresh.snapshot()
    assert after.generated == GEN and after.protocol == [1, 2]
    assert fresh.read().count() == 200
    # and the table still computes on ingest after the restore
    fresh.append(extra)
    assert fresh.read(key_between=(3000, 3000)).collect()[0][
        "event_date"] == "2024-08-01"


def test_rename_drop_of_generated_or_source_refused(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("ts", "ts2")
    with pytest.raises(ValueError, match="generated"):
        t.rename_column("event_date", "dt2")
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("ts")
    # unrelated columns stay renamable/droppable
    t.rename_column("value", "val2")
    assert "val2" in [f.name for f in
                      t.read().schema.fields]


def test_repartition_layout_off_and_back(spark, tdir):
    """Generated enforcement is independent of the layout: the column
    stays computed/validated even when it is not a partition column,
    and the derived prune simply re-arms when the layout returns."""
    t = mk(spark, os.path.join(tdir, "t"))
    t.repartition_layout(None)
    extra = spark.createDataFrame(
        [(4000, dt.datetime(2024, 9, 9), 1)],
        "event_id long, ts timestamp, value long")
    t.append(extra)     # still computed while unpartitioned
    assert t.read(key_between=(4000, 4000)).collect()[0][
        "event_date"] == "2024-09-09"
    t.repartition_layout(["event_date"])
    lo, hi = dt.datetime(2024, 9, 1), dt.datetime(2024, 9, 30)
    got = t.read(where_between=("ts", lo, hi))
    assert [r["event_id"] for r in got.collect()] == [4000]
    snap = t.snapshot()
    scanned = {os.path.relpath(lh._fs_path(r[0]), t.path) for r in
               got.select(F.input_file_name()).distinct().collect()}
    assert all(snap.files[p]["partition"]["event_date"] == "2024-09-09"
               for p in scanned)


def test_stats_based_derived_prune_when_not_partitioned(spark, tdir):
    """The derived prune also works through per-file COLUMN STATS when
    the generated column is not (or no longer) in the hive layout —
    same monotone argument, manifest min/max instead of exact
    partition values."""
    df = events_df(spark).withColumn(   # cluster ts with the key so
        "ts", F.timestamp_micros(      # per-file event_date ranges
            (F.lit(_BASE_US)           # are narrow (key-range files)
             + (F.col("event_id") * F.lit(86_400_000_000) / 20)
             ).cast("long")))
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), df, "event_id", n_files=8,
        generated={"event_date": "date_format(ts, 'yyyy-MM-dd')"})
    assert t.snapshot().partition_by is None
    lo, hi = dt.datetime(2024, 3, 2), dt.datetime(2024, 3, 3, 23, 59)
    got = t.read(where_between=("ts", lo, hi))
    want = sorted(r["event_id"] for r in
                  t.read().filter(F.col("ts").between(lo, hi)).collect())
    assert sorted(r["event_id"] for r in got.collect()) == want
    assert want
    # the stats prune bit: files whose event_date range excludes
    # [2024-03-02, 2024-03-03] were never listed
    snap = t.snapshot()
    scanned = {os.path.relpath(lh._fs_path(f), t.path)
               for f in got.inputFiles()}
    ok = {p for p, s in snap.files.items()
          if (r_ := s["cols"].get("event_date")) is None
          or (r_[1] >= "2024-03-02" and r_[0] <= "2024-03-03")}
    assert scanned <= ok
    assert len(ok) < len(snap.files)


def test_deep_fsck_detects_generated_violation(spark, tdir):
    """Simulate the exact failure protocol v2 exists to prevent — a
    writer that commits rows WITHOUT honoring the generator (as a v1
    client would if it ignored the floor): hand-craft a data file with
    a wrong event_date and publish its add-action directly.  Deep fsck
    must report the invariant violation; shallow fsck (manifest-only)
    cannot see it."""
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), events_df(spark), "event_id",
        n_files=2, generated=GEN)       # unpartitioned: pure data case
    assert t.fsck(deep=True) == []
    bad_dir = os.path.join(t.path, "data", "bypass")
    (spark.createDataFrame(
        [(5000, dt.datetime(2024, 3, 9, 6, 0), 1, "1999-01-01")],
        "event_id long, ts timestamp, value long, event_date string")
     .coalesce(1).write.parquet(bad_dir))
    f = [x for x in os.listdir(bad_dir) if x.endswith(".parquet")][0]
    rel = os.path.join("data", "bypass", f)
    snap = t.snapshot()
    assert t._try_commit(snap.version + 1, [
        {"commit": {"op": "ROGUE_APPEND"}},
        {"add": {"path": rel, "rows": 1,
                 "bytes": os.path.getsize(os.path.join(t.path, rel)),
                 "min_key": 5000, "max_key": 5000, "cols": {}}}])
    assert t.fsck() == []               # manifest-level: looks healthy
    findings = t.fsck(deep=True)
    assert len(findings) == 1
    assert "generated" in findings[0] and "1 row" in findings[0]


def test_checkpoint_json_carries_generated(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    snap = t.snapshot()
    t._write_checkpoint(snap)
    ckpt = os.path.join(t.log_dir, lh._ckpt_name(snap.version))
    with open(ckpt) as f:
        data = json.load(f)
    assert data["generated"] == GEN


def test_derived_prune_gated_on_source_dtype(spark, tdir):
    """ADVICE r7 (medium): a recognized generator SHAPE is only
    monotone in its source's NATIVE ordering.  g = floor(s / 2) over a
    STRING s orders numerically while the residual filter (and s's own
    stats) order lexicographically: `s BETWEEN '1' AND '5'` matches
    '10', but g('10')=5 is outside [g('1'),g('5')]=[0,2] — trusting
    the shape pruned the file holding s='10' and silently dropped its
    matching rows.  The dtype gate must forfeit the prune instead."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"),
        # keys 0-49: s in '1'..'5' (g in [0,2]); keys 50-99: s='10'
        # (g=5) — create()'s key-range split puts them in separate
        # files, so the unsound prune would drop the whole second file
        F.when(F.col("id") < 50,
               (F.col("id") % 5 + 1).cast("string"))
         .otherwise(F.lit("10")).alias("s"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "k",
                          n_files=2,
                          generated={"g": "floor(s / 2)"})
    pruned = t.read(where_between=("s", "1", "5"))
    full = t.read().filter(F.col("s").between("1", "5"))
    assert pruned.count() == full.count() == 100  # '10' matches lex
    assert pruned.filter(F.col("s") == "10").count() == 50
    assert (pruned.exceptAll(full).count() == 0
            and full.exceptAll(pruned).count() == 0)


def test_derived_prune_still_works_on_aligned_dtype(spark, tdir):
    """The dtype gate must not kill the legitimate prune: the same
    floor-div shape over a NUMERIC source still skips files."""
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), F.col("id").alias("n"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "k",
                          n_files=4,
                          generated={"g": "floor(n / 10)"})
    got = t.read(where_between=("n", 0, 9))
    assert len(got.inputFiles()) < len(t.snapshot().files)
    assert sorted(r["n"] for r in got.collect()) == list(range(10))


def test_nondeterministic_generator_escape_hatches_refused(spark,
                                                           tdir):
    """ADVICE r7 (low): zero-arg unix_timestamp() (current time) and
    reflect/java_method (arbitrary JVM calls) must fail create()
    validation — a nondeterministic generator drifts the col=expr
    invariant silently on every ingest.  unix_timestamp(ts) WITH an
    argument is deterministic and stays allowed."""
    base = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2024-03-01 12:00:00")).alias("ts"))
    for bad in ("unix_timestamp()", "to_unix_timestamp()",
                "reflect('java.lang.System', 'nanoTime')",
                "java_method('java.lang.System', 'nanoTime')",
                "k + unix_timestamp( )"):
        with pytest.raises(ValueError,
                           match="non-deterministic|current-time"):
            TxLogTable.create(
                spark, os.path.join(tdir, "bad"), base, "k",
                generated={"g": bad})
    # positive control: the one-arg form is deterministic
    t = TxLogTable.create(
        spark, os.path.join(tdir, "ok"), base, "k",
        generated={"g": "unix_timestamp(ts)"})
    assert t.read().filter("g <> unix_timestamp(ts)").count() == 0
    assert t.fsck(deep=True) == []
