"""Content-hash seal tests (r10: the stronger fsck tier above mtime).

Threat model ladder the tiers climb, each test pinning one rung:
- byte-size check (shallow fsck): catches appends/truncation;
- commit-time mtime stamp (deep fsck): catches same-size overwrites;
- content seal (`stamp_hashes()` + `fsck(verify_hashes=True)`):
  catches same-size overwrites where the foreign writer RESTORES the
  original mtime with `os.utime` — the adversary the mtime tier is
  honestly blind to.

Bloom sidecars get the same ladder: the m/8 size check, a
`bloom_mtime_ns` stamp (new in r10 — a same-size sidecar overwrite
with extra bits set fails OPEN at probe time and passes the
completeness audit, so only the stamp can see it), and a
`bloom_sha256` seal.

Seals are point-in-time and must survive exactly the operations that
preserve bytes: RESTORE (same files), shallow CLONE (same files),
deep CLONE (byte-identical copies) — and die with the file on
rewrite (OPTIMIZE), reported honestly when absent.
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
    d = tempfile.mkdtemp(prefix="txlog_seal_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def mk(spark, path, n=200, n_files=4, bloom=0):
    df = spark.range(0, n).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value"))
    return TxLogTable.create(spark, path, df, "user_id",
                             n_files=n_files, key_bloom_bits=bloom)


def _tamper_same_size_restore_mtime(full: str) -> None:
    """The adversary: flip bytes mid-file (same size), then put the
    original mtime back — invisible to size AND mtime checks."""
    st = os.stat(full)
    with open(full, "r+b") as f:
        f.seek(st.st_size // 2)
        b = f.read(1)
        f.seek(st.st_size // 2)
        f.write(bytes([b[0] ^ 0xFF]))
    os.utime(full, ns=(st.st_atime_ns, st.st_mtime_ns))


def test_seal_then_verify_green(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    r = t.stamp_hashes()
    assert r["files_stamped"] == 4 and not r["skipped"]
    assert t.fsck(deep=True, verify_hashes=True) == []
    # every live entry carries the seal
    assert all("sha256" in s for s in t.snapshot().files.values())


def test_unsealed_table_reports_honestly(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    found = t.fsck(verify_hashes=True)
    assert len(found) == 1 and "no live file carries a content seal" \
        in found[0]


def test_seal_catches_mtime_restoring_tamper(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.stamp_hashes()
    victim = sorted(t.snapshot().files)[1]
    full = os.path.join(t.path, victim)
    st = os.stat(full)
    raw = open(full, "rb").read()
    _tamper_same_size_restore_mtime(full)
    # rungs 1+2 are blind — honest, pinned
    assert t.fsck() == []
    assert t.fsck(deep=True) == []
    # rung 3 names exactly the victim
    found = t.fsck(deep=True, verify_hashes=True)
    assert len(found) == 1
    assert victim in found[0] and "content hash" in found[0]
    # the seal is a CONTENT statement: restoring the original bytes
    # (not the mtime, not a re-stamp) satisfies it again
    with open(full, "wb") as f:
        f.write(raw)
    os.utime(full, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_stamp_commit_value_invisible_preserves_dvs(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.delete_where(key_between=(50, 99), mode="dv")  # merge-on-read
    before = sorted(r["user_id"] for r in t.read().collect())
    assert len(before) == 150
    t.stamp_hashes()
    after = sorted(r["user_id"] for r in t.read().collect())
    assert after == before                 # DVs rode the stamp commit
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_bloom_sidecar_mtime_stamp_flags_same_size_overwrite(
        spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"), bloom=10)
    assert t.fsck(deep=True) == []
    victim = sorted(t.snapshot().files)[0]
    side = os.path.join(t.path, victim) + ".bloom"
    # foreign writer sets EVERY bit: same size, completeness audit
    # still passes (all keys probe present), probes fail open
    size = os.path.getsize(side)
    with open(side, "wb") as f:
        f.write(b"\xff" * size)
    assert t.fsck() == []                  # size tier blind
    found = t.fsck(deep=True)
    assert len(found) == 1
    assert victim in found[0] and "sidecar mtime" in found[0]
    t.optimize(target_files=2)             # rebuild sidecars
    assert t.fsck(deep=True) == []


def test_bloom_sidecar_seal_catches_mtime_restoring_tamper(
        spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"), bloom=10)
    r = t.stamp_hashes()
    assert r["sidecars_stamped"] == 4
    victim = sorted(t.snapshot().files)[2]
    side = os.path.join(t.path, victim) + ".bloom"
    st = os.stat(side)
    with open(side, "wb") as f:
        f.write(b"\xff" * st.st_size)      # all-bits: fails open
    os.utime(side, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert t.fsck(deep=True) == []         # mtime tier restored-blind
    found = t.fsck(verify_hashes=True)
    assert len(found) == 1
    assert "bloom sidecar" in found[0] and victim in found[0]


def test_seal_survives_restore(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.stamp_hashes()
    v_sealed = t.snapshot().version
    t.append(spark.range(200, 260).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value")),
        n_files=2)
    t.restore(version=v_sealed)
    assert all("sha256" in s for s in t.snapshot().files.values())
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_seal_survives_both_clone_flavors(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"), n_files=10, bloom=10)
    t.stamp_hashes()
    shallow = t.clone(os.path.join(tdir, "c_shallow"))
    # 10 files >= _CLONE_DISTRIBUTE_MIN → the distributed copy path
    deep = t.clone(os.path.join(tdir, "c_deep"), deep=True)
    for c in (shallow, deep):
        assert all("sha256" in s and "bloom_sha256" in s
                   for s in c.snapshot().files.values())
        assert c.fsck(deep=True, verify_hashes=True) == []


def test_new_files_after_seal_are_unstamped_not_lied_about(
        spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    t.stamp_hashes()
    t.append(spark.range(200, 240).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value")),
        n_files=2)
    snap = t.snapshot()
    sealed = [p for p, s in snap.files.items() if "sha256" in s]
    unsealed = [p for p, s in snap.files.items() if "sha256" not in s]
    assert len(sealed) == 4 and len(unsealed) == 2
    # partial seal verifies what it has, silently skips nothing it
    # claims — and a fresh stamp covers the newcomers
    assert t.fsck(verify_hashes=True) == []
    r = t.stamp_hashes()
    assert r["files_stamped"] == 6
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_seal_survives_checkpoint_replay(spark, tdir):
    from cdc_plg_spark.lakehouse import CHECKPOINT_EVERY
    t = mk(spark, os.path.join(tdir, "t"), n=40, n_files=1)
    t.stamp_hashes()
    base = 1000
    while t.snapshot().version < CHECKPOINT_EVERY:
        t.append(spark.range(base, base + 5).select(
            F.col("id").alias("user_id"),
            (F.col("id") * 3).alias("value")), n_files=1)
        base += 5
    assert t._checkpoints()   # crossed the checkpoint boundary
    t2 = TxLogTable(spark, t.path)            # fresh handle → ckpt load
    snap = t2.snapshot()
    assert any("sha256" in s for s in snap.files.values())
    assert t2.fsck(verify_hashes=True) == []


def test_stamp_refuses_on_missing_file(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    victim = sorted(t.snapshot().files)[0]
    os.unlink(os.path.join(t.path, victim))
    with pytest.raises(ValueError, match="missing"):
        t.stamp_hashes()


def test_seal_survives_metadata_only_schema_evolution(spark, tdir):
    """rename_column / widen_column_type / add_column are metadata-only
    commits — no byte moves, so seals must persist AND verify green
    through all three (the r10 composition probe: every migration
    boundary r7-r9 found a silent bug at was a metadata/byte seam)."""
    df = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") * 3).cast("int").alias("value"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", n_files=4)
    t.stamp_hashes()
    t.rename_column("value", "val")
    t.widen_column_type("val", "long")
    t.add_column("tag", "string", default="'x'")
    snap = t.snapshot()
    assert all("sha256" in s for s in snap.files.values())
    assert t.fsck(deep=True, verify_hashes=True) == []
    # reads still correct through mapping + widening (DEFAULT applies
    # to future inserts; pre-existing rows read NULL — the engine's
    # documented add_column contract)
    got = {r["user_id"]: (int(r["val"]), r["tag"])
           for r in t.read().collect()}
    assert got[7] == (21, None)


def test_seal_on_nonhive_converted_table(spark, tdir):
    """Seal files a non-hive CONVERT imported in place (no k=v
    segments, manifest tuple is the partition authority): stamping,
    verifying, and flagging a tampered import must all work on
    absolute-layout tables too — the convert path never went through
    the engine's writer, so this is the other half of the seal's
    coverage."""
    raw = os.path.join(tdir, "upstream")
    for b in (0, 1):
        (spark.range(b * 30, b * 30 + 30)
         .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
         .coalesce(1)
         .write.mode("overwrite").parquet(os.path.join(raw, f"b{b}")))
    t = TxLogTable.convert(
        spark, raw, "k", partition_schema={"bucket": "long"},
        partition_values=lambda rel: {"bucket":
                                      int(rel.split("/")[0][1:])})
    r = t.stamp_hashes()
    assert r["files_stamped"] == len(t.snapshot().files)
    assert t.fsck(deep=True, verify_hashes=True) == []
    victim = sorted(t.snapshot().files)[0]
    vfull = os.path.join(t.path, victim)
    st = os.stat(vfull)
    raw = open(vfull, "rb").read()
    _tamper_same_size_restore_mtime(vfull)
    found = t.fsck(verify_hashes=True)
    assert len(found) == 1 and victim in found[0] \
        and "content hash" in found[0]
    # nonhive markers rode the stamp commit (an add REPLACES the
    # entry — dropping the marker would make fsck flag the layout)
    assert all(s.get("nonhive")
               for s in t.snapshot().files.values())
    # heal with the original bytes: everything green again
    with open(vfull, "wb") as f:
        f.write(raw)
    os.utime(vfull, ns=(st.st_atime_ns, st.st_mtime_ns))
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_deep_fsck_reports_corrupt_footer_instead_of_crashing(
        spark, tdir):
    """Found by this probe: a foreign writer that garbles the parquet
    FOOTER region used to crash deep fsck inside pyarrow (thrift
    deserialization error) instead of being named in the findings —
    the audit must report corruption, never die on it."""
    t = mk(spark, os.path.join(tdir, "t"))
    victim = sorted(t.snapshot().files)[0]
    full = os.path.join(t.path, victim)
    st = os.stat(full)
    with open(full, "r+b") as f:       # garble the 4-byte footer
        f.seek(st.st_size - 8)         # LENGTH field (before "PAR1")
        f.write(b"\xff\xff\xff\x7f")
    os.utime(full, ns=(st.st_atime_ns, st.st_mtime_ns))
    found = t.fsck(deep=True)
    assert any("footer unreadable" in m and victim in m for m in found)
    # shallow fsck still runs clean (size+mtime unchanged) — honest
    assert t.fsck() == []


def test_detail_reports_seal_coverage(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"))
    assert t.detail()["content_sealed_files"] is None
    t.stamp_hashes()
    assert t.detail()["content_sealed_files"] == 4
    t.append(spark.range(300, 320).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value")),
        n_files=2)
    assert t.detail()["content_sealed_files"] == 4   # newcomers unsealed


def test_stamp_from_shallow_clone_seals_mixed_paths(spark, tdir):
    """stamp_hashes invoked ON a shallow clone: the live set mixes
    ABSOLUTE out-of-root source references with the clone's own
    relative COW files — both must seal (through _abs) and verify,
    the seal commit lands only in the CLONE's log, and the source
    stays unsealed and byte-untouched."""
    t = mk(spark, os.path.join(tdir, "t"))
    c = t.clone(os.path.join(tdir, "c"))
    # straddling range (not file-aligned) → a real COW rewrite lands
    # under the CLONE's own data/
    c.delete_where(key_between=(0, 30), mode="cow")
    snap = c.snapshot()
    assert any(os.path.isabs(p) for p in snap.files)      # source refs
    assert any(not os.path.isabs(p) for p in snap.files)  # own files
    r = c.stamp_hashes()
    assert r["files_stamped"] == len(snap.files)
    assert c.fsck(deep=True, verify_hashes=True) == []
    # the source saw nothing: no seal entries, no version bump
    assert all("sha256" not in s for s in t.snapshot().files.values())
    assert t.fsck(deep=True) == []
    # tamper one SOURCE file (absolute ref): the clone's verify flags
    # it even though the byte lives outside the clone's root
    victim = sorted(p for p in snap.files if os.path.isabs(p))[0]
    _tamper_same_size_restore_mtime(victim)
    found = c.fsck(verify_hashes=True)
    assert len(found) == 1 and "content hash" in found[0]


def test_optimize_auto_reseals_sealed_table(spark, tdir):
    """Sealed-ness is sticky: on a stamped table, OPTIMIZE re-seals
    its own rewrites in the SAME commit (reseal=None auto), so
    verify_hashes coverage never erodes with compaction; on a table
    never stamped, optimize adds no seals and pays no hash pass."""
    t = mk(spark, os.path.join(tdir, "t"), bloom=10)
    t.stamp_hashes()
    t.append(spark.range(200, 260).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value")),
        n_files=2)                          # unsealed newcomers
    t.optimize(target_files=2)
    snap = t.snapshot()
    assert all("sha256" in s for s in snap.files.values())
    assert all("bloom_sha256" in s for s in snap.files.values()
               if snap.bloom_bits)
    assert t.detail()["content_sealed_files"] == len(snap.files)
    assert t.fsck(deep=True, verify_hashes=True) == []
    # explicit opt-out keeps the old shed behavior
    t.append(spark.range(300, 360).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value")),
        n_files=2)
    t.optimize(target_files=1, reseal=False)
    assert all("sha256" not in s
               for s in t.snapshot().files.values())


def test_optimize_never_seals_unstamped_table(spark, tdir):
    t = mk(spark, os.path.join(tdir, "t"), n_files=6)
    t.optimize(target_files=2)
    assert all("sha256" not in s
               for s in t.snapshot().files.values())


def test_repartition_layout_sheds_all_seals(spark, tdir):
    """Partition-spec evolution is a full rewrite: every byte is new,
    so NO seal may survive onto the new files (a stale seal attached
    to new bytes would make verify_hashes flag healthy data), and the
    post-rewrite audit reports the unsealed state honestly."""
    df = spark.range(0, 120).select(
        F.col("id").alias("user_id"), (F.col("id") * 3).alias("value"),
        (F.col("id") % 3).cast("string").alias("bucket"))
    t = TxLogTable.create(spark, os.path.join(tdir, "t"), df,
                          "user_id", n_files=4)
    t.stamp_hashes()
    t.repartition_layout(["bucket"])
    snap = t.snapshot()
    assert all("sha256" not in s for s in snap.files.values())
    found = t.fsck(verify_hashes=True)
    assert len(found) == 1 and "no live file carries" in found[0]
    # a fresh stamp restores full coverage on the new layout
    t.stamp_hashes()
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_seal_vs_epoch_idempotent_sink_replay(spark, tdir):
    """Seal x the epoch-idempotent streaming sink contract (merge
    with txn=(app, epoch)): a REPLAYED epoch is deduped — no commit,
    no byte moves, seals fully intact and verifying; a NEW epoch's
    merge sheds exactly the rewritten files' seals (new bytes) while
    untouched files keep verifying green."""
    t = mk(spark, os.path.join(tdir, "t"))
    src = spark.createDataFrame([(5, -5, "U")],
                                "user_id long, value long, op string")
    t.merge(src, op_col="op", txn=("sink", 1))
    t.stamp_hashes()
    v = t.snapshot().version
    # replayed epoch 1: deduped, nothing changes
    t.merge(src, op_col="op", txn=("sink", 1))
    assert t.snapshot().version == v
    assert all("sha256" in s for s in t.snapshot().files.values())
    assert t.fsck(deep=True, verify_hashes=True) == []
    # new epoch 2 rewrites the straddler: its seal sheds, rest keep
    t.merge(spark.createDataFrame([(6, -6, "U")],
                                  "user_id long, value long, op string"),
            op_col="op", txn=("sink", 2))
    snap = t.snapshot()
    sealed = sum(1 for s in snap.files.values() if "sha256" in s)
    assert 0 < sealed < len(snap.files)
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_seal_survives_key_rename_and_vacuum_truncation(spark, tdir):
    """Two more seam probes: (a) renaming the KEY column (column
    mapping — physical names and bytes unchanged) must leave seals
    valid; (b) VACUUM truncating the log behind a fresh checkpoint at
    the horizon must carry every seal through the checkpoint load
    path (a fresh handle reads ONLY the checkpoint)."""
    t = mk(spark, os.path.join(tdir, "t"))
    t.stamp_hashes()
    t.rename_column("user_id", "uid")
    assert t.fsck(deep=True, verify_hashes=True) == []
    # force log truncation: vacuum keeps only the tail
    t.vacuum(retain_last=1, min_age_s=0)
    t2 = TxLogTable(spark, t.path)            # fresh handle
    assert t2._versions()[0] > 0              # log truncated
    snap = t2.snapshot()
    assert all("sha256" in s for s in snap.files.values())
    assert t2.fsck(deep=True, verify_hashes=True) == []
    assert {r["uid"] for r in t2.read().collect()} == set(range(200))


def test_dv_delete_after_seal_keeps_seal_valid(spark, tdir):
    """A DV-mode delete AFTER sealing mutates the manifest entry in
    place (`ent["dv"] = ...` on replay) and never touches the file's
    bytes — the seal must survive the mutation and keep verifying."""
    t = mk(spark, os.path.join(tdir, "t"))
    t.stamp_hashes()
    t.delete_where(key_between=(60, 80), mode="dv")
    snap = t.snapshot()
    assert all("sha256" in s for s in snap.files.values())
    assert any(s.get("dv") for s in snap.files.values())
    assert t.fsck(deep=True, verify_hashes=True) == []
    assert sorted(r["user_id"] for r in t.read().collect()) \
        == [k for k in range(200) if not 60 <= k <= 80]


def test_sha256_file_reports_unreadable_not_raise(tdir):
    """_sha256_file on an open-failing path (here a directory ->
    IsADirectoryError, an OSError that is NOT FileNotFoundError)
    returns the distinct unreadable marker instead of raising — an
    executor-side raise would fail the whole hash job, and the audit
    contract is REPORT, never die (ADVICE r10).  Vanished stays None:
    the two cases drive different handling (retry vs fail/report) and
    must remain distinguishable."""
    from cdc_plg_spark.lakehouse import _HASH_UNREADABLE, _sha256_file

    p, v = _sha256_file(tdir)          # a directory, not a file
    assert p == tdir and v is not None
    assert v.startswith(_HASH_UNREADABLE)
    assert "IsADirectoryError" in v
    assert _sha256_file(os.path.join(tdir, "nope"))[1] is None


def test_fsck_reports_unreadable_during_hash_audit(
        spark, tdir, monkeypatch):
    """fsck(verify_hashes=True) with one sealed file unreadable emits
    exactly one 'unreadable during hash audit' finding carrying the
    executor-reported cause — not a crash, and not a bogus tamper
    report (the marker can never equal a sealed hexdigest, but it
    must not fall through to the mismatch message either)."""
    from cdc_plg_spark import lakehouse as lh

    t = mk(spark, os.path.join(tdir, "t"))
    t.stamp_hashes()
    victim = os.path.join(t.path, sorted(t.snapshot().files)[0])
    real = type(t)._hash_files

    def inject(self, paths):
        out = real(self, paths)
        out[victim] = (lh._HASH_UNREADABLE
                       + "PermissionError: Permission denied")
        return out

    monkeypatch.setattr(type(t), "_hash_files", inject)
    found = t.fsck(verify_hashes=True)
    assert len(found) == 1, found
    assert "unreadable during hash audit" in found[0]
    assert "Permission denied" in found[0]
    assert "!= sealed" not in found[0]


def test_stamp_fails_fast_on_unreadable_not_retry_exhaust(
        spark, tdir, monkeypatch):
    """stamp_hashes with an unreadable (but present) live file fails
    immediately with the cause — EACCES/EIO cannot be fixed by
    retrying on a fresh snapshot, so burning the 5 retries into a
    generic ConflictError would bury the actual problem."""
    from cdc_plg_spark import lakehouse as lh

    t = mk(spark, os.path.join(tdir, "t"))
    victim = os.path.join(t.path, sorted(t.snapshot().files)[0])
    real = type(t)._hash_files
    calls = {"n": 0}

    def inject(self, paths):
        calls["n"] += 1
        out = real(self, paths)
        out[victim] = lh._HASH_UNREADABLE + "OSError: Input/output error"
        return out

    monkeypatch.setattr(type(t), "_hash_files", inject)
    with pytest.raises(ValueError, match="unreadable during hash pass"):
        t.stamp_hashes()
    assert calls["n"] == 1      # failed fast, no retry loop


def test_stamp_missing_file_benign_race_retries_clean(
        spark, tdir, monkeypatch):
    """The pre-pass exists-check hitting a file that a CONCURRENT
    cow-delete + vacuum removed (stale snapshot still lists it) is
    the same benign race as the mid-pass vanish and must retry on a
    fresh snapshot, not raise a scary corruption error (ADVICE r10).
    Simulated faithfully: do the delete+vacuum for real, then feed
    stamp_hashes the pre-delete snapshot on its first snapshot()
    call only."""
    t = mk(spark, os.path.join(tdir, "t"))
    stale = t.snapshot()
    t.delete_where(key_between=(0, 9))          # cow rewrite
    t.vacuum(retain_last=1, min_age_s=0.0)      # unlink the original
    gone = [p for p in stale.files
            if not os.path.exists(os.path.join(t.path, p))]
    assert gone, "fixture: vacuum removed nothing — race not simulated"

    real = type(t).snapshot
    calls = {"n": 0}

    def first_stale(self, version=None):
        calls["n"] += 1
        if calls["n"] == 1 and version is None:
            return stale
        return real(self, version)

    monkeypatch.setattr(type(t), "snapshot", first_stale)
    r = t.stamp_hashes()
    assert not r["skipped"] and r["files_stamped"] > 0
    monkeypatch.undo()
    assert t.fsck(deep=True, verify_hashes=True) == []


def test_stamp_still_raises_when_live_file_truly_missing(spark, tdir):
    """The narrowed raise must still fire on REAL corruption: the
    file is missing AND the fresh snapshot still lists it live (no
    concurrent commit explains the absence)."""
    t = mk(spark, os.path.join(tdir, "t"))
    victim = sorted(t.snapshot().files)[0]
    os.unlink(os.path.join(t.path, victim))
    with pytest.raises(ValueError, match="missing"):
        t.stamp_hashes()


def test_merge_sheds_seals_by_contract(spark, tdir):
    """PINNED contract (r11 decision, merge() docstring): MERGE sheds
    the seals of files it rewrites and does NOT re-seal — seals are an
    audit-cadence property (stamp_hashes / OPTIMIZE), never a
    merge-commit-time one, because re-sealing would re-read every
    rewritten file on the transactional hot path.  Untouched files
    keep their seals, the audit stays green over exactly the
    still-sealed set, detail() reports the erosion, and the next
    stamp_hashes restores full coverage."""
    t = mk(spark, os.path.join(tdir, "t"))          # 4 files, keys 0..199
    t.stamp_hashes()
    n_files = len(t.snapshot().files)
    assert t.detail()["content_sealed_files"] == n_files

    # hit only the lowest file's key range + one out-of-range insert
    src = spark.createDataFrame(
        [(3, 999), (5, 999), (10_000, 1)], "user_id long, value long")
    t.merge(src)

    snap = t.snapshot()
    sealed = {p for p, s in snap.files.items() if "sha256" in s}
    unsealed = set(snap.files) - sealed
    assert unsealed, "merge rewrote nothing — fixture broken"
    assert sealed, "merge must not shed seals of untouched files"
    # rewritten/new files are exactly the post-merge mtime-stamped
    # additions: every unsealed file is absent from the sealed v1 set
    pre = set(t.snapshot(version=1).files)
    assert all(p not in pre for p in unsealed)
    assert t.detail()["content_sealed_files"] == len(sealed) < n_files

    # audit: green (no false positive on the unsealed rewrites), and
    # the sealed set is still byte-verified
    assert t.fsck(deep=True, verify_hashes=True) == []
    # ... while real tamper on a STILL-SEALED file is still caught
    victim = sorted(sealed)[0]
    _tamper_same_size_restore_mtime(os.path.join(t.path, victim))
    assert any("!= sealed" in f
               for f in t.fsck(verify_hashes=True)), "seal audit lost teeth"

    # restore bytes via re-create? cheaper: re-seal restores coverage
    t2 = mk(spark, os.path.join(tdir, "t2"))
    t2.stamp_hashes()
    t2.merge(src)
    r = t2.stamp_hashes()                            # audit cadence tick
    assert not r["skipped"]
    assert t2.detail()["content_sealed_files"] == len(t2.snapshot().files)
    assert t2.fsck(deep=True, verify_hashes=True) == []
