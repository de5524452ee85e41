"""Non-hive layout adoption (r9): manifest partition tuples are
DECOUPLED from paths — each file's typed tuple lives in its
add-action and is what readers and the pruner consult, so
`convert(partition_values=fn)` can adopt directories whose layout
encodes partition values any way at all (value-only dirs,
date-embedded names), the move Iceberg's `add_files` makes and
Delta's converter cannot.

Contract under test:
- a value-only layout (`2024-01-05/part-0.parquet`) converts by
  reference; reads attach the manifest tuples as typed literals,
  partition pruning works off the manifest, fsck is clean (the hive
  path/manifest cross-check skips paths with no k=v segments);
- the callable's output is validated per file BEFORE the commit:
  missing/extra keys, wrong type, None, or a raising callable all
  refuse with nothing published;
- generated columns compose: a non-hive layout laid out by a derived
  column formalizes as GENERATED ALWAYS AS, existing data validated
  via the manifest-attached scan, derived pruning from source-column
  predicates afterwards;
- the full write surface works after adoption: MERGE rewrites into
  the native hive layout, and the change feed reads the REMOVED
  non-hive files through tuples carried from the older snapshot;
- integral partition values round-trip typed.
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
    d = tempfile.mkdtemp(prefix="txlog_nonhive_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def write_value_only(spark, path, n=240):
    """Upstream-job layout: one VALUE-ONLY directory per day
    (`<dt>/part-*.parquet`, no `dt=` prefix), the partition column
    absent from the parquet bytes — unreadable by hive discovery,
    adoptable only through manifest tuples."""
    base_us = 1_709_251_200_000_000          # 2024-03-01 UTC, micros
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"),
        F.timestamp_micros(
            (F.lit(base_us) + (F.col("id") % 6) * F.lit(86_400_000_000)
             + F.col("id") * F.lit(1_000_000)).cast("long")).alias("ts"),
        (F.col("id") * 2).alias("value"))
    days = [r["d"] for r in df.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct()
        .collect()]
    for d in sorted(days):
        (df.filter(F.date_format("ts", "yyyy-MM-dd") == d)
           .repartitionByRange(2, "user_id")
           .write.mode("overwrite")
           .parquet(os.path.join(path, d)))
    # Spark leaves _SUCCESS markers; harmless (convert walks *.parquet)
    return df


def by_dir(rel):
    return {"dt": rel.replace("\\", "/").split("/")[0]}


def test_convert_value_only_layout(spark, tdir):
    path = os.path.join(tdir, "t")
    df = write_value_only(spark, path)
    t = TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=by_dir)
    snap = t.snapshot()
    assert snap.partition_by == ["dt"]
    # every add-action carries its typed tuple, derived from the
    # value-only dir name — no k=v anywhere in the paths
    assert all("=" not in p for p in snap.files)
    assert all(s["partition"]["dt"].startswith("2024-03-")
               for s in snap.files.values())
    # reads attach the manifest tuples: full logical schema back
    want = {r["user_id"]: (r["value"], r["d"]) for r in df.select(
        "user_id", "value",
        F.date_format("ts", "yyyy-MM-dd").alias("d")).collect()}
    got = {r["user_id"]: (r["value"], r["dt"])
           for r in t.read().collect()}
    assert got == want
    # partition pruning straight off the manifest tuples
    pruned = t.read(where_between=("dt", "2024-03-02", "2024-03-02"))
    assert {r["dt"] for r in pruned.collect()} == {"2024-03-02"}
    assert len(pruned.inputFiles()) < len(snap.files)
    # fsck: manifest is the authority for pathless tuples
    assert t.fsck(deep=True) == []


def test_convert_value_only_integral_partition(spark, tdir):
    path = os.path.join(tdir, "t")
    for b in (0, 1, 2):
        (spark.range(b * 50, b * 50 + 50)
         .select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
         .write.mode("overwrite")
         .parquet(os.path.join(path, f"bucket-{b}")))
    t = TxLogTable.convert(
        spark, path, "k", partition_schema={"bucket": "long"},
        partition_values=lambda rel: {
            "bucket": int(rel.split("/")[0].split("-")[1])})
    snap = t.snapshot()
    assert {s["partition"]["bucket"] for s in snap.files.values()} \
        == {0, 1, 2}
    assert all(isinstance(s["partition"]["bucket"], int)
               for s in snap.files.values())
    got = t.read().filter(F.col("bucket") == 1)
    assert sorted(r["k"] for r in got.collect()) == list(range(50, 100))
    # typed pruning on the integral tuple
    pruned = t.read(where_between=("bucket", 2, 2))
    assert len(pruned.inputFiles()) < len(snap.files)
    assert t.fsck(deep=True) == []


def test_partition_values_validation_refuses(spark, tdir):
    path = os.path.join(tdir, "t")
    write_value_only(spark, path, n=60)

    def log_absent():
        assert not TxLogTable(spark, path)._versions()

    with pytest.raises(ValueError, match="requires partition_schema"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_values=by_dir)
    log_absent()
    with pytest.raises(ValueError, match="partition keys"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=lambda rel: {})
    log_absent()
    with pytest.raises(ValueError, match="partition keys"):
        TxLogTable.convert(
            spark, path, "user_id",
            partition_schema={"dt": "string"},
            partition_values=lambda rel: {**by_dir(rel), "extra": 1})
    log_absent()
    # wrong type: int for a declared string (and bool for a long)
    with pytest.raises(ValueError, match="not a string"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=lambda rel: {"dt": 7})
    log_absent()
    with pytest.raises(ValueError, match="not a long"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "long"},
                           partition_values=lambda rel: {"dt": True})
    log_absent()
    with pytest.raises(ValueError, match="not a string"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=lambda rel: {"dt": None})
    log_absent()

    def boom(rel):
        raise KeyError("no date here")

    with pytest.raises(ValueError, match="partition_values failed"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=boom)
    log_absent()


def test_nonhive_generated_partition_composes(spark, tdir):
    """The r7/r8 migration-boundary composition, now over a NON-hive
    layout: dt is derived from ts upstream, encoded only in the
    value-only dir name, formalized as GENERATED ALWAYS AS at
    convert.  Validation must run over the manifest-attached scan
    (hive discovery sees no partition column here at all)."""
    path = os.path.join(tdir, "t")
    write_value_only(spark, path)
    # wrong declaration (day-shifted) refused pre-commit, dir adoptable
    with pytest.raises(CheckViolation):
        TxLogTable.convert(
            spark, path, "user_id",
            partition_schema={"dt": "string"},
            partition_values=by_dir,
            generated={"dt":
                       "date_format(ts + interval 1 day, 'yyyy-MM-dd')"})
    assert not TxLogTable(spark, path)._versions()
    t = TxLogTable.convert(
        spark, path, "user_id", partition_schema={"dt": "string"},
        partition_values=by_dir,
        generated={"dt": "date_format(ts, 'yyyy-MM-dd')"})
    snap = t.snapshot()
    assert snap.protocol == [1, 2]
    # derived prune: a SOURCE-column predicate prunes the imported
    # non-hive partitions through the generator at the manifest
    got = t.read(where_between=("ts", "2024-03-02", "2024-03-03"))
    assert len(got.inputFiles()) < len(snap.files)
    full = t.read().filter(F.col("ts").between("2024-03-02",
                                               "2024-03-03"))
    assert (got.exceptAll(full).count() == 0
            and full.exceptAll(got).count() == 0)
    assert got.count() > 0
    # ingest across the boundary recomputes dt (native hive layout)
    t.append(spark.sql(
        "SELECT 9001L AS user_id, TIMESTAMP '2024-03-09 00:00:00' "
        "AS ts, 0L AS value"))
    got = {r["user_id"]: r["dt"]
           for r in t.read().filter("user_id = 9001").collect()}
    assert got == {9001: "2024-03-09"}
    assert t.fsck(deep=True) == []


def test_nonhive_merge_and_change_feed(spark, tdir):
    """Full write surface after adoption: a MERGE rewrites touched
    non-hive files into the native hive layout (one table, two
    layouts side by side — each file read under its OWN manifest
    tuple), and table_changes across the merge reads the REMOVED
    value-only files through tuples carried from the older snapshot
    — the decoupling's acid test, since those files are absent from
    the head manifest AND their paths carry no k=v segments."""
    path = os.path.join(tdir, "t")
    write_value_only(spark, path)
    t = TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=by_dir)
    v0 = t.snapshot().version
    before = {r["user_id"]: (r["value"], r["dt"])
              for r in t.read().collect()}
    src = spark.createDataFrame(
        [(5, "2024-03-06 00:00:05", -5, "2024-03-06", "U"),
         (7, None, None, None, "D"),
         (9001, "2024-03-07 00:00:00", 1, "2024-03-07", "I")],
        "user_id long, ts string, value long, dt string, op string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    t.merge(src, op_col="op")
    snap = t.snapshot()
    # mixed layouts now coexist: surviving imports value-only, the
    # merge's rewrite hive-style
    assert any("=" not in p for p in snap.files)
    assert any("dt=" in p for p in snap.files)
    after = {r["user_id"]: (r["value"], r["dt"])
             for r in t.read().collect()}
    want = dict(before)
    want[5] = (-5, "2024-03-06")
    want[9001] = (1, "2024-03-07")
    del want[7]
    assert after == want
    # change feed across the merge: net I/U/D only, before-images
    # read out of the REMOVED non-hive files
    ch = {(r["user_id"], r["change_type"]): r
          for r in t.table_changes(v0, snap.version).collect()}
    assert set(ch) == {(5, "U"), (7, "D"), (9001, "I")}
    assert ch[(5, "U")]["dt"] == "2024-03-06"
    assert ch[(7, "D")]["dt"] == before[7][1]      # before-image tuple
    assert ch[(7, "D")]["value"] == before[7][0]
    assert t.fsck(deep=True) == []


def test_cdf_stream_over_nonhive_table(spark, tdir):
    """The streaming CDF source must attach NON-hive files' partition
    columns from the manifest tuples carried in each CommitPartition
    (r9): its executor-side pyarrow diff can't see hive segments that
    don't exist.  Before the fix, a non-hive table's partition column
    streamed as NULL for every before-image — silently."""
    from cdc_plg_spark.sources.txlog_stream import TxLogChangesSource

    spark.dataSource.register(TxLogChangesSource)
    path = os.path.join(tdir, "t")
    write_value_only(spark, path, n=60)
    t = TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=by_dir)
    expect_dt = {r["user_id"]: r["d"] for r in
                 t.read().select("user_id",
                                 F.col("dt").alias("d")).collect()}
    t.merge(spark.createDataFrame(
        [(5, "2024-03-06 00:00:05", -5, "2024-03-06", "U"),
         (7, None, None, None, "D")],
        "user_id long, ts string, value long, dt string, op string"
    ).withColumn("ts", F.col("ts").cast("timestamp")), op_col="op")
    out = os.path.join(tdir, "out")
    q = (spark.readStream.format("txlog_changes")
         .option("path", t.path).option("fullImages", "true").load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(tdir, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["change_type"]): r["dt"]
           for r in spark.read.parquet(out)
           .filter(F.col("commit_version") == 1).collect()}
    # before-images come OUT of the removed value-only files: their
    # dt can only have come from the carried manifest tuples
    assert got[(5, "U_pre")] == expect_dt[5]
    assert got[(5, "U_post")] == "2024-03-06"
    assert got[(7, "D")] == expect_dt[7]


def test_nonhive_widen_temporal_and_cdf(spark, tdir):
    """Non-hive x type-widening x temporal-prune x CDF composition
    (the r8 bug zone was exactly this class of migration boundary):
    a value-only import with a narrow INT column widens meta-only,
    reads back long with manifest tuples attached, temporal pruning
    stays sound, and a post-widen merge + change feed nets exactly."""
    raw = os.path.join(tdir, "t")
    for b in (0, 1):
        (spark.range(b * 30, b * 30 + 30).select(
            F.col("id").alias("k"),
            F.col("id").cast("int").alias("narrow"),
            F.timestamp_micros((F.lit(1704067200000000)
                                + F.col("id") * F.lit(1000000))
                               .cast("long")).alias("ts"))
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(raw, f"day{b}")))
    t = TxLogTable.convert(
        spark, raw, "k", partition_schema={"day": "long"},
        partition_values=lambda rel: {"day": int(rel.split("/")[0][3:])})
    t.widen_column_type("narrow", "long")
    got = t.read()
    assert got.schema["narrow"].dataType.typeName() == "long"
    assert {r["k"]: (r["narrow"], r["day"]) for r in got.collect()} \
        == {k: (k, k // 30) for k in range(60)}
    pr = t.read(where_between=("ts", "2024-01-01 00:00:10",
                               "2024-01-01 00:00:20"))
    assert pr.count() == 11
    v0 = t.snapshot().version
    t.merge(spark.createDataFrame(
        [(5, -5, "2024-01-01 00:00:05", 0, "U")],
        "k long, narrow long, ts string, day long, op string")
        .withColumn("ts", F.col("ts").cast("timestamp")), op_col="op")
    ch = {(r["k"], r["change_type"]) for r in
          t.table_changes(v0, t.snapshot().version).collect()}
    assert ch == {(5, "U")}
    assert t.fsck(deep=True) == []


def test_partition_values_refuses_empty_and_hive_null(spark, tdir):
    """ADVICE r9: the callable branch type-checked isinstance only,
    so an empty string or the literal __HIVE_DEFAULT_PARTITION__
    slipped into the manifest — violating the 'NULL/empty partition
    values are rejected at write time' invariant the hive-convert and
    native-write paths both enforce."""
    path = os.path.join(tdir, "t")
    write_value_only(spark, path, n=60)

    def log_absent():
        assert not TxLogTable(spark, path)._versions()

    with pytest.raises(ValueError, match="NULL/empty"):
        TxLogTable.convert(spark, path, "user_id",
                           partition_schema={"dt": "string"},
                           partition_values=lambda rel: {"dt": ""})
    log_absent()
    with pytest.raises(ValueError, match="NULL/empty"):
        TxLogTable.convert(
            spark, path, "user_id",
            partition_schema={"dt": "string"},
            partition_values=lambda rel:
                {"dt": "__HIVE_DEFAULT_PARTITION__"})
    log_absent()
