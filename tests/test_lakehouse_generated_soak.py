"""Soundness soak for the generated-column derived partition prune.

The derived prune is the one place a bug SILENTLY DROPS ROWS (a wrong
partition interval skips a file whose rows match), so beyond the
fixed-point cases in test_lakehouse_generated.py this soak hammers it
with seeded-random predicate bounds across every recognized generator
shape — including inverted, empty, single-point, and boundary-straddling
ranges — and requires bit-identical ids vs the unpruned full-scan
filter every time.  Also pins the streaming path: the epoch-idempotent
foreachBatch sink appending into a generated-partitioned table must
compute the column per micro-batch (the CDC-changelog-to-hive shape).
"""

from __future__ import annotations

import datetime as dt
import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import TxLogTable


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_gensoak_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


_BASE = dt.datetime(2023, 11, 20, tzinfo=dt.timezone.utc)
_BASE_US = int(_BASE.timestamp()) * 1_000_000
_SPAN_DAYS = 90     # crosses a year boundary: 2023-11-20 .. 2024-02-18


def corpus(spark, n=600):
    """ts spans a YEAR BOUNDARY (the hardest case for date-text and
    year generators), name is a mixed-prefix string, v a long."""
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        F.timestamp_micros(
            (F.lit(_BASE_US)
             + (F.col("id") % _SPAN_DAYS) * F.lit(86_400_000_000)
             + (F.col("id") * 7919 % 86_400) * F.lit(1_000_000))
            .cast("long")).alias("ts"),
        F.concat(F.lit("doc-"),
                 F.lpad((F.col("id") * 37 % 500).cast("string"), 4, "0"),
                 F.lit("-x")).alias("name"),
        ((F.col("id") * 13) % 5000).alias("v"))


def _ids(df):
    return sorted(r["k"] for r in df.select("k").collect())


def _soak(t, base_df, cases):
    """Every (col, lo, hi) case: pruned read == full-scan filter."""
    full = t.read()
    for col, lo, hi in cases:
        got = _ids(t.read(where_between=(col, lo, hi)))
        want = _ids(full.filter(F.col(col).between(lo, hi)))
        assert got == want, (col, lo, hi, len(got), len(want))


def test_date_format_generator_random_bounds(spark, tdir):
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), corpus(spark), "k", n_files=6,
        partition_by=["event_date"],
        generated={"event_date": "date_format(ts, 'yyyy-MM-dd')"})
    rng = random.Random(20260815)
    cases = []
    for _ in range(25):
        a = _BASE + dt.timedelta(seconds=rng.randrange(0, _SPAN_DAYS * 86_400))
        b = _BASE + dt.timedelta(seconds=rng.randrange(0, _SPAN_DAYS * 86_400))
        cases.append(("ts", a.replace(tzinfo=None), b.replace(tzinfo=None)))
    # adversarial fixed cases: empty (inverted), point, exact-midnight
    # boundaries, the year rollover, and the full span
    cases += [
        ("ts", dt.datetime(2024, 1, 5), dt.datetime(2023, 12, 1)),
        ("ts", dt.datetime(2023, 12, 25), dt.datetime(2023, 12, 25)),
        ("ts", dt.datetime(2023, 12, 31), dt.datetime(2024, 1, 1)),
        ("ts", dt.datetime(2023, 11, 20), dt.datetime(2024, 2, 18)),
        ("ts", dt.datetime(2025, 1, 1), dt.datetime(2026, 1, 1)),
    ]
    _soak(t, corpus(spark), cases)


def test_year_and_floor_generators_random_bounds(spark, tdir):
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), corpus(spark), "k", n_files=6,
        partition_by=["yr", "vb"],
        generated={"yr": "year(ts)", "vb": "floor(v / 500)"})
    rng = random.Random(4242)
    cases = []
    for _ in range(20):
        lo, hi = rng.randrange(-100, 5200), rng.randrange(-100, 5200)
        cases.append(("v", lo, hi))
    cases += [("v", 499, 500), ("v", 500, 500), ("v", 0, 4999),
              ("v", 5000, 100), ("v", -50, -1)]
    for _ in range(10):
        a = _BASE + dt.timedelta(days=rng.randrange(-40, _SPAN_DAYS + 40))
        b = _BASE + dt.timedelta(days=rng.randrange(-40, _SPAN_DAYS + 40))
        cases.append(("ts", a.replace(tzinfo=None), b.replace(tzinfo=None)))
    _soak(t, corpus(spark), cases)


def test_prefix_generator_random_bounds(spark, tdir):
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), corpus(spark), "k", n_files=6,
        partition_by=["bucket"],
        generated={"bucket": "substring(name, 1, 7)"})
    rng = random.Random(99)
    cases = []
    for _ in range(20):
        a = f"doc-{rng.randrange(0, 500):04d}"
        b = f"doc-{rng.randrange(0, 500):04d}-x"
        cases.append(("name", a, b) if a <= b else ("name", b, a))
    cases += [("name", "doc-0000", "doc-0000-x"),       # single bucket
              ("name", "a", "z"),                        # full span
              ("name", "doc-0100-x", "doc-0100"),        # inverted
              ("name", "e", "f")]                        # empty
    _soak(t, corpus(spark), cases)


def test_stacked_predicates_double_derived_prune(spark, tdir):
    """Two predicates, each deriving into a DIFFERENT generated
    partition column — the stacked CDC read shape."""
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), corpus(spark), "k", n_files=6,
        partition_by=["yr", "vb"],
        generated={"yr": "year(ts)", "vb": "floor(v / 500)"})
    got = t.read(where_between=[("ts", "2024-01-01", "2024-02-18"),
                                ("v", 1000, 2400)])
    want = (t.read()
            .filter(F.col("ts").between("2024-01-01", "2024-02-18"))
            .filter(F.col("v").between(1000, 2400)))
    assert _ids(got) == _ids(want)
    assert len(_ids(got)) > 0


@pytest.mark.parametrize("seed", [7, 31])
def test_random_ops_on_generated_table_match_dict_model(spark, tdir,
                                                        seed):
    """Model-based soak on a GENERATED-partitioned table: a random
    interleaving of full MERGE / partial ts-moving MERGE / key DELETE
    (cow and dv) / OPTIMIZE / RESTORE must keep the table equal to a
    trivial dict model after every step AND keep the generated
    invariant (event_date == date_format(ts)) — i.e. the engine keeps
    computing/moving the generated value no matter which write path a
    row arrives through.  Final deep fsck proves paths, manifest
    partition values, and stats all still agree."""
    rng = random.Random(seed)
    base = [(k, dt.datetime(2024, 1, 1 + k % 20, 6, 0), k * 2)
            for k in range(40)]
    df = spark.createDataFrame(base, "k long, ts timestamp, v long")
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), df, "k", n_files=4,
        partition_by=["event_date"],
        generated={"event_date": "date_format(ts, 'yyyy-MM-dd')"})
    model = {k: (ts, v) for k, ts, v in base}
    history = {t.snapshot().version: dict(model)}

    def rnd_ts():
        return dt.datetime(2024, rng.randint(1, 6), rng.randint(1, 28),
                           rng.randint(0, 23))

    def check_head():
        rows = t.read().collect()
        got = {r["k"]: (r["ts"], r["v"]) for r in rows}
        assert got == model
        assert all(r["event_date"] == r["ts"].strftime("%Y-%m-%d")
                   for r in rows)

    for _ in range(10):
        kind = rng.choices(
            ("merge", "merge_partial_ts", "delete", "delete_dv",
             "optimize", "restore"),
            weights=(5, 4, 2, 2, 1, 1))[0]
        if kind == "merge":
            keys = rng.sample(range(60), rng.randint(1, 5))
            rows, ops = [], {}
            for k in keys:
                op = rng.choice("IUD")
                ts, v = rnd_ts(), rng.randint(-99, 99)
                rows.append((k, ts, v, op))
                ops[k] = (op, ts, v)
            m = t.merge(spark.createDataFrame(
                rows, "k long, ts timestamp, v long, op string"),
                op_col="op")
            for k, (op, ts, v) in ops.items():
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = (ts, v)
            history[m["version"]] = dict(model)
        elif kind == "merge_partial_ts":
            live = sorted(model)
            if not live:
                continue
            keys = rng.sample(live, min(len(live), rng.randint(1, 4)))
            rows = [(k, rnd_ts(), "U") for k in keys]
            m = t.merge(spark.createDataFrame(
                rows, "k long, ts timestamp, op string"),
                op_col="op", partial=True)
            for k, ts, _ in rows:
                model[k] = (ts, model[k][1])    # ts moves, v kept
            history[m["version"]] = dict(model)
        elif kind in ("delete", "delete_dv"):
            lo = rng.randint(0, 50)
            hi = lo + rng.randint(0, 15)
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
            eligible = [v for v in t._versions() if v in history]
            rv = rng.choice(eligible)
            rm = t.restore(version=rv)
            model = dict(history[rv])
            history[rm["version"]] = dict(model)
        check_head()

    assert t.fsck(deep=True) == []
    # every surviving recorded version still replays to its model
    for v in t._versions():
        if v in history:
            got = {r["k"]: (r["ts"], r["v"])
                   for r in t.read(version=v).collect()}
            assert got == history[v], f"version {v} diverged"


def test_change_feed_reports_partition_move_as_update(spark, tdir):
    """A partial merge that moves a row's ts (and therefore its
    generated hive partition — physically a remove from one directory
    and an add in another) must surface in the change feed as ONE
    key-level update with consistent images, never as a spurious
    delete+insert pair."""
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), corpus(spark, 60), "k",
        n_files=3, partition_by=["event_date"],
        generated={"event_date": "date_format(ts, 'yyyy-MM-dd')"})
    v0 = t.snapshot().version
    old = t.read(key_between=(7, 7)).collect()[0]
    new_ts = dt.datetime(2025, 5, 5, 5, 5)
    m = t.merge(spark.createDataFrame(
        [(7, new_ts, "U")], "k long, ts timestamp, op string"),
        op_col="op", partial=True)
    ch = t.table_changes(v0, m["version"]).collect()
    assert [(r["change_type"], r["k"]) for r in ch] == [("U", 7)]
    assert ch[0]["event_date"] == "2025-05-05"
    imgs = {r["change_type"]: r for r in
            t.table_changes(v0, m["version"], full_images=True)
             .filter(F.col("k") == 7).collect()}
    assert set(imgs) == {"U_pre", "U_post"}
    assert imgs["U_pre"]["event_date"] == old["event_date"]
    assert imgs["U_pre"]["v"] == old["v"]
    assert imgs["U_post"]["event_date"] == "2025-05-05"
    assert imgs["U_post"]["v"] == old["v"]     # partial: v untouched


def test_streaming_sink_computes_generated_column(spark, tdir):
    """foreachBatch epoch-idempotent appends into a generated-
    partitioned table: each micro-batch ships only (k, ts, name, v)
    and the write path computes event_date — streaming CDC into hive
    layout without the producer knowing the layout exists."""
    from cdc_plg_spark.streaming.core import run_foreach_batch

    seed = corpus(spark, 50)
    t = TxLogTable.create(
        spark, os.path.join(tdir, "t"), seed, "k", n_files=2,
        partition_by=["event_date"],
        generated={"event_date": "date_format(ts, 'yyyy-MM-dd')"})
    src_dir = os.path.join(tdir, "src")
    corpus(spark, 80).filter(F.col("k") >= 50).write.parquet(src_dir)
    stream = (spark.readStream.schema(
        "k long, ts timestamp, name string, v long")
        .option("maxFilesPerTrigger", 1).parquet(src_dir))

    def apply_batch(bdf, epoch):
        TxLogTable(bdf.sparkSession, t.path).append(
            bdf, txn=("gen_sink", epoch))

    ckpt = os.path.join(tdir, "ckpt")
    run_foreach_batch(stream, apply_batch, ckpt)
    assert t.read().count() == 80
    bad = t.read().filter(
        F.col("event_date") != F.date_format("ts", "yyyy-MM-dd")).count()
    assert bad == 0
    # and the hive layout is real: a one-day read prunes to its files
    snap = t.snapshot()
    dates = {s["partition"]["event_date"] for s in snap.files.values()}
    assert len(dates) > 10
    assert t.fsck(deep=True) == []
