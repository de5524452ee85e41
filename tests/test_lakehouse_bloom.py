"""Per-file key BLOOM FILTER tests for the TxLog lakehouse format.

Blooms are the exact-key data-skipping tier under MERGE's copy-on-write
pruning: [min_key, max_key] containment admits a file whenever the
range overlaps, which after OPTIMIZE ZORDER (key ranges deliberately
widen) degrades to rewrite-everything; the bloom sidecar restores
key-membership pruning.  The invariants pinned here:

- a bloom can only REMOVE files that definitely lack every source key
  (no false negatives ⇒ merge results are bit-identical with blooms
  on and off, pinned by a randomized equivalence check);
- sidecars ride the manifest: rewrites re-emit them, checkpoints and
  replay preserve the add-action annotation, vacuum keeps live
  sidecars and collects dead ones, fsck flags a missing/truncated one;
- the probe fails OPEN (unreadable sidecar ⇒ candidate), never closed.
"""

from __future__ import annotations

import os
import random
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.lakehouse import TxLogTable

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="txlog_bloom_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def make_btable(spark, path, n=1000, n_files=4, bits=10):
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"),
        (F.col("id") % 7).alias("grp"))
    return TxLogTable.create(spark, path, df, "user_id",
                             n_files=n_files, key_bloom_bits=bits)


def bsrc(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, value long, grp long, op string")


def sidecars_on_disk(t):
    return sorted(
        os.path.relpath(os.path.join(dp, f), t.path)
        for dp, _, fs in os.walk(os.path.join(t.path, "data"))
        for f in fs if f.endswith(".bloom"))


def test_create_writes_sidecars_and_manifest_meta(spark, tdir):
    t = make_btable(spark, os.path.join(tdir, "t"))
    snap = t.snapshot()
    assert snap.bloom_bits == 10
    assert len(snap.files) == 4
    for p, s in snap.files.items():
        bl = s["bloom"]
        assert bl["m"] % 8 == 0 and bl["k"] >= 1
        side = os.path.join(t.path, p + ".bloom")
        assert os.path.getsize(side) == bl["m"] // 8
    assert t.fsck() == []
    assert t.detail()["key_bloom_bits"] == 10


def test_bloom_prunes_merge_after_zorder(spark, tdir):
    """THE motivating case: ZORDER on two non-key columns widens every
    file's key range (range pruning admits nearly everything), and the
    bloom still bounds the COW rewrite set near the true hit count."""
    t = make_btable(spark, os.path.join(tdir, "t"), n=4000, n_files=8)
    t.optimize(zorder_by=("value", "grp"), target_files=8)
    snap = t.snapshot()
    probe = spark.createDataFrame([(5,)], "user_id long")
    range_hits = [p for p, s in snap.files.items()
                  if s["min_key"] <= 5 <= s["max_key"]]
    cands = t._candidate_files(snap, probe, "user_id")
    # the z-layout makes most files admit key 5 by range; the bloom
    # must cut that to (almost exactly) the one file that has it
    assert len(range_hits) >= 3
    assert len(cands) <= 2
    assert set(cands) <= set(range_hits)
    # and the merge itself stays correct through the pruned path
    m = t.merge(bsrc(spark, [(5, -1, 0, "U")]), op_col="op")
    assert m["files_scanned"] == len(cands)
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got[5] == -1 and len(got) == 4000


def test_absent_inrange_key_prunes_to_zero_candidates(spark, tdir):
    """An insert whose key is INSIDE file ranges but in no file (table
    holds only even keys, probe is odd) should — with ~(1-fpr)^n
    probability — touch ZERO existing files: range pruning alone can
    never do this, only the bloom can."""
    df = spark.range(0, 1000).select(
        (F.col("id") * 2).alias("user_id"),
        F.col("id").alias("value"), (F.col("id") % 7).alias("grp"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          n_files=4, key_bloom_bits=10)
    snap = t.snapshot()
    probe = spark.createDataFrame([(501,)], "user_id long")
    range_hits = [p for p, s in snap.files.items()
                  if s["min_key"] <= 501 <= s["max_key"]]
    assert len(range_hits) >= 1     # it IS in some file's range
    assert t._candidate_files(snap, probe, "user_id") == []
    # and the merge turns it into a pure insert: zero rewrites
    src = spark.createDataFrame([(501, -1, 0, "I")],
                                "user_id long, value long, grp long, "
                                "op string")
    m = t.merge(src, op_col="op")
    assert m["files_scanned"] == 0
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got[501] == -1 and len(got) == 1001


def test_merge_equivalence_bloom_on_vs_off(spark, tdir):
    """Randomized: the same op sequence against a bloomed and an
    unbloomed table must produce identical content at every step —
    the no-false-negative contract, end to end."""
    rng = random.Random(71)
    tb = make_btable(spark, os.path.join(tdir, "b"), n=300, n_files=3)
    tp = TxLogTable.create(
        spark, os.path.join(tdir, "p"),
        spark.range(0, 300).select(
            F.col("id").alias("user_id"),
            (F.col("id") * 2).alias("value"),
            (F.col("id") % 7).alias("grp")),
        "user_id", n_files=3)
    for step in range(6):
        rows = []
        for k in rng.sample(range(600), rng.randint(1, 8)):
            op = rng.choice("IUD")
            rows.append((k, rng.randint(-99, 99), k % 7, op))
        sdf = bsrc(spark, rows)
        tb.merge(sdf, op_col="op")
        tp.merge(sdf, op_col="op")
        if step == 3:
            tb.optimize(zorder_by=("value", "grp"), target_files=3)
            tp.optimize(zorder_by=("value", "grp"), target_files=3)
        got_b = {r["user_id"]: (r["value"], r["grp"])
                 for r in tb.read().collect()}
        got_p = {r["user_id"]: (r["value"], r["grp"])
                 for r in tp.read().collect()}
        assert got_b == got_p, f"diverged at step {step}"
        assert tb.fsck() == []


def test_rewrites_and_checkpoint_replay_preserve_blooms(spark, tdir):
    t = make_btable(spark, os.path.join(tdir, "t"), n=400, n_files=3)
    t.merge(bsrc(spark, [(1, -1, 1, "U"), (2000, 0, 0, "I")]),
            op_col="op")
    t.delete_where((10, 20), mode="cow")
    t.optimize(target_files=2)
    snap = t.snapshot()
    assert all("bloom" in s for s in snap.files.values())
    # force a checkpoint, then prove replay-from-checkpoint keeps both
    # the table-level bloom_bits and every per-file annotation
    t._write_checkpoint(snap)
    snap2 = t.snapshot(snap.version)
    assert snap2.bloom_bits == 10
    assert {p: s.get("bloom") for p, s in snap2.files.items()} \
        == {p: s.get("bloom") for p, s in snap.files.items()}
    assert t.fsck() == []


def test_vacuum_collects_dead_sidecars_keeps_live(spark, tdir):
    t = make_btable(spark, os.path.join(tdir, "t"), n=400, n_files=3)
    t.merge(bsrc(spark, [(1, -1, 1, "U")]), op_col="op")
    t.optimize(target_files=2)
    t.vacuum(retain_last=1, min_age_s=0)
    live = set(t.snapshot().files)
    disk = set(sidecars_on_disk(t))
    assert disk == {p + ".bloom" for p in live}
    assert t.fsck() == []


def test_fsck_flags_missing_and_truncated_sidecar(spark, tdir):
    t = make_btable(spark, os.path.join(tdir, "t"), n=200, n_files=2)
    snap = t.snapshot()
    p0, p1 = sorted(snap.files)
    os.unlink(os.path.join(t.path, p0 + ".bloom"))
    with open(os.path.join(t.path, p1 + ".bloom"), "ab") as f:
        f.write(b"\x00")
    finds = t.fsck()
    assert any("bloom sidecar missing" in f_ for f_ in finds)
    assert any("bloom sidecar" in f_ and "m/8" in f_ for f_ in finds)


def test_deep_fsck_catches_incomplete_bloom(spark, tdir):
    """fsck(deep=True) must prove bloom COMPLETENESS: zeroing bits in
    a sidecar creates exactly the silent-lost-update hazard (a key in
    the file probing absent), and only the deep check can see it —
    size and existence stay valid."""
    t = make_btable(spark, os.path.join(tdir, "t"), n=200, n_files=2)
    assert t.fsck(deep=True) == []
    p0 = sorted(t.snapshot().files)[0]
    side = os.path.join(t.path, p0 + ".bloom")
    with open(side, "r+b") as f:
        f.write(b"\x00" * (os.path.getsize(side) // 2))
    assert t.fsck() == []                   # shallow can't see it
    finds = t.fsck(deep=True)
    assert any("bloom INCOMPLETE" in f_ for f_ in finds), finds


def test_probe_fails_open_on_missing_sidecar(spark, tdir):
    """A deleted sidecar must widen the candidate set (fail open),
    never narrow it — merges stay correct, only pruning degrades."""
    t = make_btable(spark, os.path.join(tdir, "t"), n=200, n_files=2)
    snap = t.snapshot()
    for p in snap.files:
        os.unlink(os.path.join(t.path, p + ".bloom"))
    probe = spark.createDataFrame([(5,)], "user_id long")
    range_hits = sorted(p for p, s in snap.files.items()
                        if s["min_key"] <= 5 <= s["max_key"])
    assert t._candidate_files(snap, probe, "user_id") == range_hits
    m = t.merge(bsrc(spark, [(5, -1, 5, "U")]), op_col="op")
    assert not m["skipped"]
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got[5] == -1


def test_string_keys_and_partitioned_table_compose(spark, tdir):
    """Blooms hash VALUES, so string keys work; and on a hive-
    partitioned table the sidecar lives inside the k=v directory and
    survives vacuum's bottom-up walk."""
    df = spark.range(0, 300).select(
        F.concat(F.lit("k"), F.format_string("%05d", "id"))
         .alias("user_id"),
        (F.col("id") * 2).alias("value"),
        (F.col("id") % 3).cast("string").alias("cat"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          n_files=3, partition_by=["cat"],
                          key_bloom_bits=12)
    snap = t.snapshot()
    assert all("bloom" in s for s in snap.files.values())
    assert t.fsck() == []
    probe = spark.createDataFrame([("k00042",)], "user_id string")
    cands = t._candidate_files(snap, probe, "user_id")
    assert 1 <= len(cands) <= 2
    src = spark.createDataFrame([("k00042", -1, "0", "U")],
                                "user_id string, value long, "
                                "cat string, op string")
    t.merge(src, op_col="op")
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got["k00042"] == -1 and len(got) == 300
    t.vacuum(retain_last=1, min_age_s=0)
    assert t.fsck(deep=True) == []      # incl. string-key completeness
    assert set(sidecars_on_disk(t)) == \
        {p + ".bloom" for p in t.snapshot().files}


@pytest.mark.multijvm
def test_multiprocess_writer_race_bloomed(spark, tdir):
    """The multi-process MERGE/OPTIMIZE/VACUUM torture on a BLOOMED
    table: every winning merge also builds sidecars, every losing
    writer's orphan sidecars must stay invisible, and after the dust
    settles each live file's sidecar exists with the manifested size
    (fsck) and content is exactly last-write-wins.  The riskiest new
    interleaving is vacuum unlinking a dead writer's sidecar while
    another writer probes it — the probe's fail-open contract absorbs
    it."""
    import subprocess
    import sys as _sys

    path = os.path.join(tdir, "t")
    df = spark.range(0, 50).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"))
    TxLogTable.create(spark, path, df, "user_id", n_files=1,
                      key_bloom_bits=10)
    workers, iters = 3, 3
    script = os.path.join(os.path.dirname(__file__),
                          "_txlog_race_worker.py")
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [_sys.executable, script, path, str(w), str(iters)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=tdir) for w in range(workers)]
    for w, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, \
            f"worker {w} rc={p.returncode}\n{out.decode()[-3000:]}"

    t = TxLogTable(spark, path)
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    expect = {k: k * 2 for k in range(50)}
    for w in range(workers):
        for k in range(20):
            expect[1000 + w * 100 + k] = w * 10000 + iters - 1
    assert got == expect
    snap = t.snapshot()
    assert all("bloom" in s for s in snap.files.values())
    assert t.fsck(deep=True) == []


def test_bloom_measured_write_amplification_sf01(spark):
    """Measured COW write amplification at sf0.1: after ZORDER on
    (user_id, value), the 16 files' event_id ranges widen until range
    pruning admits (nearly) all of them for a 20-key merge — the
    bloomed table must rewrite at most a quarter of what the
    range-only table rewrites, with identical post-merge content."""
    from cdc_plg_spark.catalog import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.1").select(
        "event_id", "user_id", "value").filter(F.col("value").isNotNull())
    d = tempfile.mkdtemp(prefix="bloom_sf01_")
    try:
        tb = TxLogTable.create(spark, os.path.join(d, "b"), ev,
                               "event_id", n_files=16, key_bloom_bits=10)
        tp = TxLogTable.create(spark, os.path.join(d, "p"), ev,
                               "event_id", n_files=16)
        for t in (tb, tp):
            t.optimize(zorder_by=("user_id", "value"), target_files=16)
        keys = [r["event_id"] for r in
                ev.select("event_id").orderBy("event_id")
                  .limit(1000).collect()][::400]    # 3 spread keys
        src = spark.createDataFrame(
            [(k, -1, -1.0) for k in keys],
            "event_id long, user_id long, value double")
        mb = tb.merge(src)
        mp = tp.merge(src)
        # 3 keys live in <= 3 files; range-only pruning must have
        # degraded (z-layout) while the bloom stays near the true
        # count.  The bloom bound budgets for false positives: at 10
        # bits/key the per-probe FP rate is ~1%, and ~45 non-true
        # (key, file) probes survive the range prune post-ZORDER, so
        # E[FP] ~ 0.4 — two FPs (5 files) shows up in a few percent
        # of runs (observed), four (7 files) is ~1e-4.  <= 6 keeps
        # the exhibit sharp (vs >= 12 range-only) without the flake.
        assert mp["files_scanned"] >= 12            # ranges widened
        assert mb["files_scanned"] <= 6, \
            (mb["files_scanned"], mp["files_scanned"])
        got_b = {r["event_id"]: r["user_id"]
                 for r in tb.read().collect()}
        got_p = {r["event_id"]: r["user_id"]
                 for r in tp.read().collect()}
        assert got_b == got_p
        print(f"bloom write-amp: {mp['files_scanned']} -> "
              f"{mb['files_scanned']} files rewritten")
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("cseed", [5, 23])
def test_random_ops_partitioned_bloomed_renamed_match_model(
        spark, tdir, cseed):
    """ALL the format features stacked — hive partitioning + key
    blooms + column mapping + partition-spec evolution — under the
    randomized dict-model check: random MERGE (partition moves,
    post-create partition values) / COW + DV DELETE / OPTIMIZE (every
    other one a ZORDER) / VACUUM / RENAME COLUMN / REPARTITION
    (flat <-> by-cat) interleavings.  Head state must equal the model
    (value AND partition value per key), fsck must stay clean after
    every step (which includes sidecar existence/size for every live
    file), and surviving historical versions must replay exactly.
    Feature interleavings are where latent bugs live (the partitioned
    check alone found the vacuum IsADirectoryError)."""
    rng = random.Random(cseed)
    df = (spark.range(0, 40)
          .select(F.col("id").alias("user_id"),
                  (F.col("id") * 2).alias("value"),
                  F.concat(F.lit("c"), (F.col("id") % 3).cast("string"))
                  .alias("cat")))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df, "user_id",
                          n_files=4, partition_by=["cat"],
                          key_bloom_bits=10)
    model = {k: (k * 2, f"c{k % 3}") for k in range(40)}
    history = {0: dict(model)}
    horizon = 0
    val_col = "value"           # logical name drifts under renames

    def check_head():
        got = {r["user_id"]: (r[val_col], r["cat"])
               for r in t.read().collect()}
        assert got == model
        assert t.fsck() == []

    layouts = [["cat"], None]       # flip on each repartition op
    for step in range(10):
        kind = rng.choices(("merge", "delete_dv", "delete_cow",
                            "optimize", "vacuum", "rename",
                            "repartition"),
                           weights=(5, 2, 1, 2, 1, 1, 2))[0]
        if kind == "merge":
            rows, ops = [], {}
            for k in rng.sample(range(80), rng.randint(1, 6)):
                op = rng.choice("IUD")
                v = rng.randint(-99, 99)
                cat = f"c{rng.randint(0, 3)}"
                rows.append((k, v, cat, op))
                ops[k] = (op, v, cat)
            sdf = spark.createDataFrame(
                rows, f"user_id long, {val_col} long, cat string, "
                      f"op string")
            m = t.merge(sdf, op_col="op")
            for k, (op, v, cat) in ops.items():
                if op == "D":
                    model.pop(k, None)
                else:
                    model[k] = (v, cat)
            history[m["version"]] = dict(model)
        elif kind in ("delete_dv", "delete_cow"):
            lo = rng.randint(0, 70)
            hi = lo + rng.randint(0, 20)
            dm = t.delete_where((lo, hi),
                                mode=kind.removeprefix("delete_"))
            for k in list(model):
                if lo <= k <= hi:
                    del model[k]
            history[dm["version"]] = dict(model)
        elif kind == "optimize":
            zo = ((val_col, "user_id") if rng.random() < 0.5 else None)
            m = t.optimize(target_files=2, zorder_by=zo)
            if not m["skipped"]:
                history[m["version"]] = dict(model)
        elif kind == "rename":
            new = f"value_r{step}"
            m = t.rename_column(val_col, new)
            val_col = new
            history[m["version"]] = dict(model)
        elif kind == "repartition":
            layouts.reverse()       # flat <-> by-cat, content-neutral
            m = t.repartition_layout(layouts[0], target_files=2)
            if not m["skipped"]:
                history[m["version"]] = dict(model)
        else:
            vm = t.vacuum(retain_last=3, min_age_s=0)
            if vm["horizon"] is not None:
                horizon = vm["horizon"]
        check_head()

    # historical replay: versions below a rename replay under the OLD
    # name; read via the column POSITION instead (schema order stable)
    for v in t._versions():
        if v in history and v >= horizon:
            rows = t.read(version=v).collect()
            got = {r["user_id"]: (r[1], r["cat"]) for r in rows}
            assert got == history[v], f"version {v} diverged"


def test_change_stream_over_bloomed_table(spark, tdir):
    """The streaming change reader replays manifests via the same
    Snapshot code as batch, so bloom annotations must pass through it
    transparently — pinned here because the reader's executor-side
    diff is the one consumer that re-reads commit JSON off-driver."""
    from cdc_plg_spark.sources.txlog_stream import TxLogChangesSource

    spark.dataSource.register(TxLogChangesSource)
    t = make_btable(spark, os.path.join(tdir, "t"), n=50, n_files=2)
    t.merge(bsrc(spark, [(1, -1, 1, "U"), (49, 0, 0, "D")]),
            op_col="op")
    out = os.path.join(tdir, "out")
    q = (spark.readStream.format("txlog_changes")
         .option("path", t.path).load()
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", os.path.join(tdir, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["change_type"], r["user_id"])
           for r in spark.read.parquet(out)
                    .filter(F.col("commit_version") == 1).collect()}
    assert got == {("U", 1), ("D", 49)}


def test_point_read_prunes_via_bloom(spark, tdir):
    """read(key_between=(k, k)) on a bloomed z-ordered table must
    touch (almost exactly) the one file holding k — and an absent
    in-range key reads ZERO files — where range stats alone admit
    most of the table."""
    t = make_btable(spark, os.path.join(tdir, "t"), n=2000, n_files=8)
    t.optimize(zorder_by=("value", "grp"), target_files=8)
    snap = t.snapshot()
    range_hits = [p for p, s in snap.files.items()
                  if s["min_key"] <= 7 <= s["max_key"]]
    assert len(range_hits) >= 3       # z-layout widened key ranges
    hit = t.read(key_between=(7, 7))
    assert len(hit.inputFiles()) <= 2
    assert [r["user_id"] for r in hit.collect()] == [7]
    # absent key: present by range in several files, in none by bloom
    miss = t.read(key_between=(100_000 + 1, 100_000 + 1))
    assert miss.count() == 0
    df2 = spark.range(0, 100).select(
        (F.col("id") * 2).alias("user_id"),
        F.col("id").alias("value"), (F.col("id") % 7).alias("grp"))
    t2 = TxLogTable.create(spark, os.path.join(tdir, "t2"), df2,
                           "user_id", n_files=2, key_bloom_bits=10)
    odd = t2.read(key_between=(51, 51))
    assert odd.inputFiles() == [] and odd.count() == 0
    # ranges keep the plain path: lo < hi never consults the bloom
    rng = t2.read(key_between=(50, 52))
    assert rng.count() == 2


def test_bloom_bits_validated_at_create(spark, tdir):
    df = spark.range(3).select(F.col("id").alias("user_id"),
                               F.col("id").alias("value"))
    with pytest.raises(ValueError, match="key_bloom_bits"):
        TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", key_bloom_bits=33)
    with pytest.raises(ValueError, match="key_bloom_bits"):
        TxLogTable.create(spark, os.path.join(tdir, "t2"), df,
                          "user_id", key_bloom_bits=-1)


def test_deep_fsck_bloom_on_escaped_partition_values(spark, tdir):
    """Bloom completeness audit on a hive-partitioned table whose
    partition value contains a literal '%' (escaped to %25 on disk):
    the executor probe's input_file_name round trip decodes ONCE —
    a double decode would corrupt the path, orphan the manifest
    lookup, and either KeyError or mis-attribute the finding.  Both
    the healthy pass and the corruption finding must name the right
    file."""
    df = spark.range(0, 120).select(
        F.col("id").alias("user_id"), (F.col("id") * 2).alias("value"),
        F.when(F.col("id") % 2 == 0, "a%b").otherwise("plain")
         .alias("cat"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", n_files=2, partition_by=["cat"],
                          key_bloom_bits=10)
    assert t.fsck(deep=True) == []
    victim = sorted(p for p in t.snapshot().files if "%25" in p)[0]
    side = os.path.join(t.path, victim + ".bloom")
    with open(side, "r+b") as f:
        f.write(b"\x00" * (os.path.getsize(side) // 2))
    finds = t.fsck(deep=True)
    assert any("bloom INCOMPLETE" in f_ and victim in f_
               for f_ in finds), finds


def test_merge_source_with_narrower_key_dtype_still_rewrites(spark,
                                                             tdir):
    """Canonical bloom hash domain: Spark's xxhash64 is width-sensitive
    (xxhash64(INT 5) != xxhash64(BIGINT 5)), so before the canon a
    merge source carrying the key as INT probed a LONG-keyed table's
    sidecars in the wrong domain — every present key probed ABSENT,
    the true file was never rewritten, and the upsert landed as a
    DUPLICATE key (reproduced).  Build, probe, and audit now all hash
    the key cast to one canonical class (integral → long)."""
    t = make_btable(spark, os.path.join(tdir, "t"), n=200, n_files=4)
    src_int = spark.createDataFrame(
        [(5, -99, 0, "U")], "user_id int, value long, grp long, op string")
    m = t.merge(src_int, op_col="op")
    assert m["files_scanned"] == 1          # the true file, via bloom
    rows = t.read().filter("user_id = 5").collect()
    assert [(r["user_id"], r["value"]) for r in rows] == [(5, -99)]
    assert t.read().count() == 200          # no duplicate key
    # point read probes the same canonical domain
    assert len(t.read(key_between=(5, 5)).inputFiles()) == 1
    assert t.fsck(deep=True) == []          # audit agrees with build


def test_int_key_table_blooms_and_wider_source_refused(spark, tdir):
    """A table whose declared key IS a narrow integral type builds and
    probes in the same canonical domain (int-keyed roundtrip), and a
    source WIDER than the table is refused loudly: before the
    `_conform_types` gate, merging a BIGINT-keyed source into this
    INT-keyed table committed INT64 parquet under the table's pinned
    INT read schema — the commit succeeded and every later read died
    with PARQUET_COLUMN_DATA_TYPE_MISMATCH (reproduced)."""
    df = spark.range(0, 300).select(
        F.col("id").cast("int").alias("user_id"),
        (F.col("id") * 2).alias("value"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", n_files=4, key_bloom_bits=10)
    # same-width source: bloom prune + upsert work on the int key
    src = spark.createDataFrame(
        [(7, -1, "U"), (250, -2, "U")],
        "user_id int, value long, op string")
    m = t.merge(src, op_col="op")
    assert 1 <= m["files_scanned"] <= 2
    got = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert got[7] == -1 and got[250] == -2
    assert t.read().count() == 300
    assert t.fsck(deep=True) == []
    # wider-than-table source: refused before anything lands
    v = t.snapshot().version
    wide = spark.createDataFrame(
        [(8, -3, "U")], "user_id long, value long, op string")
    with pytest.raises(ValueError, match="lossless"):
        t.merge(wide, op_col="op")
    with pytest.raises(ValueError, match="lossless"):
        t.append(wide.drop("op"))
    assert t.snapshot().version == v
    assert t.read().count() == 300      # table still readable, intact


def test_untagged_bloom_domain_fails_open(spark, tdir):
    """ADVICE r7 (low): the canonical bloom hash domain is versioned in
    each add-action's bloom entry.  A sidecar whose tag is absent (or
    from another canon) was built hashing a DIFFERENT domain — probing
    it with the current canon false-negatives, merges skip the true
    files, and duplicate keys land.  Probe must treat such entries as
    NO sidecar (fail OPEN to range pruning) and deep fsck must flag
    them for rebuild instead of mis-auditing completeness."""
    import json as _json

    t = make_btable(spark, os.path.join(tdir, "t"), n=200, n_files=2)
    # simulate a pre-versioning writer: strip the domain tag from
    # every committed bloom entry (sidecar bytes untouched)
    for fn in os.listdir(t.log_dir):
        p = os.path.join(t.log_dir, fn)
        if not fn.endswith(".json"):
            continue
        lines = []
        with open(p) as fh:
            for line in fh:
                if not line.strip():
                    continue
                a = _json.loads(line)
                if "add" in a and "bloom" in a.get("add", {}):
                    a["add"]["bloom"].pop("domain", None)
                lines.append(_json.dumps(a))
        with open(p, "w") as fh:
            fh.write("\n".join(lines) + "\n")
    t2 = TxLogTable(spark, t.path)
    snap = t2.snapshot()
    assert all("domain" not in (s.get("bloom") or {})
               for s in snap.files.values())   # strip really happened
    probe = spark.createDataFrame([(5,)], "user_id long")
    range_hits = sorted(p for p, s in snap.files.items()
                        if s["min_key"] <= 5 <= s["max_key"])
    # fail OPEN: every range-admitted file stays a candidate (a
    # domain-blind probe would narrow this to the bloom hits)
    assert t2._candidate_files(snap, probe, "user_id") == range_hits
    # merge still lands exactly once — no duplicate key
    t2.merge(bsrc(spark, [(5, -1, 5, "U")]), op_col="op")
    rows = t2.read().filter(F.col("user_id") == 5).collect()
    assert len(rows) == 1 and rows[0]["value"] == -1
    # deep fsck: flags the stale domain, never a false INCOMPLETE
    finds = t2.fsck(deep=True)
    assert any("hash domain" in f_ for f_ in finds), finds
    assert not any("INCOMPLETE" in f_ for f_ in finds), finds
    # OPTIMIZE rebuilds tagged sidecars and clears the finding
    t2.optimize(target_files=2)
    assert t2.fsck(deep=True) == []
