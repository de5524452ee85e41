"""Streaming SOURCE over the TxLog table format — tail the commit log.

`format("txlog_changes")` turns a TxLog table (cdc_plg_spark.lakehouse)
into an unbounded stream of row-level I/U/D change events, one batch
element per commit: the reference's product — an ordered change stream
(/root/reference/README.md:17) — served back OUT of the warehouse so a
table can be a CDC relay, not a terminus.  Together with the
foreachBatch merge sink (stream_sink_lakehouse_merge) this closes the
loop: stream → table → stream.

Scale shape:
- Offsets are commit versions (a dict `{"version": N}` in Spark's
  offset log), so checkpoint recovery is exact replay of whole commits
  — the resume-from-checkpoint-ts contract (README.md:65,:119).
- The driver does manifest work only: per new commit it diffs the two
  snapshots' file lists (pure JSON replay, no data pass) and emits ONE
  InputPartition per commit carrying the removed/added file lists.
- Executors do all data work: each partition diffs its commit's
  removed-vs-added files with pyarrow/pandas (Arrow batch reads, key-
  level outer merge, null-safe column compare) and yields the net
  I/U/D rows for that commit.  Rows rewritten unchanged cancel, so a
  stats-pruned merge commit streams only its real changes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource, DataSourceStreamReader, InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from cdc_plg_spark.lakehouse import _parse_partition_path, _typed_part


def _log_versions(log_dir: str) -> list[int]:
    if not os.path.isdir(log_dir):
        return []
    return sorted(int(f[:20]) for f in os.listdir(log_dir)
                  if f[:20].isdigit() and f.endswith(".json")
                  and not f.endswith(".checkpoint.json"))


def _snapshot(table_path: str, version: int):
    """Manifest replay with stdlib only — safe on driver AND executor
    (TxLogTable.snapshot needs no SparkSession, but importing the class
    here keeps one replay implementation)."""
    from cdc_plg_spark.lakehouse import TxLogTable

    return TxLogTable(None, table_path).snapshot(version)


class CommitPartition(InputPartition):
    def __init__(self, table_path: str, version: int,
                 removed: list[str], added: list[str],
                 schema_json: str, key_col: str,
                 full_images: bool = False,
                 dv_old: list | None = None,
                 dv_new: list | None = None,
                 dv_grown: list | None = None,
                 grown_files: list[str] | None = None,
                 mapping: dict | None = None,
                 partition_by: list[str] | None = None,
                 dv_shrunk: list | None = None,
                 shrunk_files: list[str] | None = None,
                 parts: dict | None = None) -> None:
        self.table_path = table_path
        self.version = version
        self.removed = removed
        self.added = added
        self.schema_json = schema_json
        self.key_col = key_col
        self.full_images = full_images
        # logical -> physical parquet column names (column mapping);
        # None/{} = identity
        self.mapping = mapping or {}
        # deletion-vector context for this commit step:
        # dv_old — keys already dv-deleted at v-1 in `removed` files
        #          (never live in this step; drop from the old side)
        # dv_new — keys dv-deleted at v in `added` files (not live)
        # dv_grown / grown_files — keys whose DV grew on surviving
        #          files this commit (= the dv-mode deletes to emit)
        self.dv_old = dv_old or []
        self.dv_new = dv_new or []
        self.dv_grown = dv_grown or []
        self.grown_files = grown_files or []
        # dv_shrunk / shrunk_files — keys whose DV SHRANK on surviving
        #          files this commit (RESTORE resurrecting dv-deleted
        #          rows; emit as inserts on the new side)
        self.dv_shrunk = dv_shrunk or []
        self.shrunk_files = shrunk_files or []
        # partition columns (PHYSICAL names): the parquet bytes lack
        # them; each file's TYPED values ride along in `parts` ({rel
        # path -> tuple}, from the add-actions — the manifest is the
        # authority, r9) and re-attach at read.  Pre-r9 manifests
        # without tuples fall back to hive k=v path parsing.
        self.partition_by = partition_by or []
        self.parts = parts or {}


class TxLogChangesSource(DataSource):
    """format("txlog_changes"), option path=<table dir>."""

    @classmethod
    def name(cls) -> str:
        return "txlog_changes"

    def schema(self) -> StructType:
        snap = _snapshot(self.options["path"],
                         _log_versions(os.path.join(
                             self.options["path"], "_txlog"))[-1])
        table_schema = StructType.fromJson(json.loads(snap.schema_json))
        return StructType(
            [StructField("commit_version", IntegerType(), False),
             StructField("change_type", StringType(), False),
             *table_schema.fields])

    def streamReader(self, schema) -> "TxLogChangesReader":
        # option fullImages=true: updates emit BOTH images as
        # U_pre/U_post rows (the 4-row-kind Delta-CDF shape) so a
        # downstream incremental computation can retract before-images
        #
        # option maxCommitsPerTrigger=N: admission control for
        # catch-up — cap each planned batch at N commits (default 0 =
        # unbounded, the availableNow replay the tests pin)
        return TxLogChangesReader(
            self.options["path"],
            self.options.get("fullImages", "false").lower() == "true",
            pinned_schema=schema,
            max_commits=int(self.options.get("maxCommitsPerTrigger", 0)))


class TxLogChangesReader(DataSourceStreamReader):
    def __init__(self, table_path: str, full_images: bool = False,
                 pinned_schema=None, max_commits: int = 0) -> None:
        self.table_path = os.path.abspath(table_path)
        self.log_dir = os.path.join(self.table_path, "_txlog")
        self.full_images = full_images
        # maxCommitsPerTrigger admission control: without it, a stream
        # STARTED on a table with a deep commit history plans its whole
        # backlog as ONE micro-batch — the unbounded-catch-up failure
        # shape at scale.  latestOffset() returns at most `max_commits`
        # past `_base`, the last COMMITTED offset (initialOffset /
        # commit()) — NOT the last value latestOffset returned, because
        # Spark may call latestOffset several times within one planning
        # cycle (e.g. progress reporting) and the cap must be
        # idempotent across those calls.  Restart-safe: Spark's
        # recovery calls commit() on the restored committed batch
        # (re-seeding the base) and replays an UNCOMMITTED restored
        # batch from its logged range without consulting latestOffset,
        # so the cap holds across restarts with no stall and no
        # replay hole (pinned by the bounded-catchup test).
        self.max_commits = max_commits
        self._base: int | None = None
        # the schema Spark pinned when the stream STARTED: commits
        # that widen the table mid-stream must project down to it (a
        # streaming DataFrame's schema is immutable — the honest
        # Spark limit; restart the stream to pick up new columns).
        # Strip the two feed columns; keep only table fields.
        self.pinned_json = None
        if pinned_schema is not None:
            table_fields = [f for f in pinned_schema.fields
                            if f.name not in ("commit_version",
                                              "change_type")]
            self.pinned_json = StructType(table_fields).json()
        # the COLUMN MAPPING pinned at the same moment as the schema:
        # physical parquet names are stable across RENAME COLUMN, so
        # files from commits made BEFORE a rename translate to the
        # pinned (current) logical names through the latest mapping —
        # without this, a pre-rename commit's rows would surface NULL
        # under the pinned name.  (Mid-stream renames still require a
        # restart, like all non-additive DDL.)
        try:
            from cdc_plg_spark.lakehouse import TxLogTable

            versions = _log_versions(self.log_dir)
            self.pinned_mapping = (TxLogTable(None, self.table_path)
                                   .snapshot(versions[-1]).mapping
                                   if versions else None)
        except Exception:
            self.pinned_mapping = None

    # ---- driver side: offsets + manifest diff --------------------------

    def initialOffset(self) -> dict:
        # start at the table's FIRST log entry: version 0 (CREATE) is
        # the base image, so the first emitted batch is commit 1
        versions = _log_versions(self.log_dir)
        if not versions:
            raise ValueError(f"not a TxLog table: {self.table_path}")
        self._base = versions[0]
        return {"version": versions[0]}

    def latestOffset(self) -> dict:
        versions = _log_versions(self.log_dir)
        head = versions[-1]
        if self.max_commits > 0:
            if self._base is None:
                # Spark polls latestOffset BEFORE initialOffset on a
                # fresh start — seed the base with what initialOffset
                # will return so the very first batch is already capped
                self._base = versions[0]
            head = min(head, self._base + self.max_commits)
        return {"version": head}

    def partitions(self, start: dict, end: dict):
        # the planned range is ground truth for the admission cap's
        # base (covers checkpoint restart, where Spark replays the
        # last uncommitted batch without calling initialOffset)
        if self._base is None or start["version"] > self._base:
            self._base = start["version"]
        out = []
        # adjacent commits share a snapshot: replay each version ONCE
        # and roll it forward, halving driver-side manifest work on a
        # catch-up batch spanning many commits
        a = _snapshot(self.table_path, start["version"])
        for v in range(start["version"] + 1, end["version"] + 1):
            b = _snapshot(self.table_path, v)
            removed = sorted(set(a.files) - set(b.files))
            added = sorted(set(b.files) - set(a.files))
            grown = {p: sorted(set(b.files[p].get("dv", ()))
                               - set(a.files[p].get("dv", ())))
                     for p in set(a.files) & set(b.files)}
            grown = {p: ks for p, ks in grown.items() if ks}
            shrunk = {p: sorted(set(a.files[p].get("dv", ()))
                                - set(b.files[p].get("dv", ())))
                      for p in set(a.files) & set(b.files)}
            shrunk = {p: ks for p, ks in shrunk.items() if ks}
            # per-file partition tuples spanning BOTH snapshots:
            # removed files are absent from b.files (mirrors
            # TxLogTable.table_changes' pparts)
            pool = {**a.files, **b.files}
            touched = (set(removed) | set(added)
                       | set(grown) | set(shrunk))
            parts = {p: pool[p]["partition"] for p in touched
                     if pool[p].get("partition")}
            out.append(CommitPartition(
                self.table_path, v, removed, added,
                self.pinned_json or b.schema_json,
                b.key_col, self.full_images,
                mapping=(self.pinned_mapping if self.pinned_mapping
                         is not None else b.mapping),
                dv_old=sorted({k for p in removed
                               for k in a.files[p].get("dv", ())}),
                dv_new=sorted({k for p in added
                               for k in b.files[p].get("dv", ())}),
                dv_grown=sorted({k for ks in grown.values()
                                 for k in ks}),
                grown_files=sorted(grown),
                partition_by=b.partition_by,
                dv_shrunk=sorted({k for ks in shrunk.values()
                                  for k in ks}),
                shrunk_files=sorted(shrunk), parts=parts))
            a = b
        # Spark requires >= 1 partition per planned batch
        return out or [CommitPartition(self.table_path, -1, [], [],
                                       a.schema_json, "")]

    def commit(self, end: dict) -> None:
        self._base = end["version"]

    # ---- executor side: per-commit file diff ---------------------------

    def read(self, partition: CommitPartition):
        if partition.version < 0:
            return
        import pandas as pd
        import pyarrow.parquet as pq

        from pyspark.sql.types import StructType as _St

        fields = _St.fromJson(json.loads(partition.schema_json)).fields
        cols = [f.name for f in fields]
        key = partition.key_col
        data_cols = [c for c in cols if c != key]

        # partitioned files: each file's OWN manifest tuple decides
        # which columns re-attach — not the head layout, because one
        # batch can span layouts (files removed by a repartition_layout
        # evolution commit carry the previous partitioning), and a
        # NON-hive converted file's path carries no k=v segments at
        # all (r9 decoupling).  Pre-r9 manifests fall back to hive
        # path parsing.  Mirrors TxLogTable._read_files.
        phys_type = {(partition.mapping or {}).get(f.name, f.name):
                     f.dataType.typeName() for f in fields}

        def load(rel_paths) -> "pd.DataFrame":
            frames = []
            for p in rel_paths:
                pdf = pq.read_table(
                    os.path.join(partition.table_path, p)).to_pandas()
                tup = partition.parts.get(p)
                if tup is None:
                    tup = {pc: _typed_part(raw, phys_type[pc])
                           for pc, raw in
                           _parse_partition_path(p).items()
                           if pc in phys_type}
                for pc, v in tup.items():
                    if pc in phys_type and pc not in pdf.columns:
                        pdf[pc] = v
                frames.append(pdf)
            if not frames:
                return pd.DataFrame(columns=cols)
            df = pd.concat(frames, ignore_index=True)
            if partition.mapping:
                # column mapping: parquet carries PHYSICAL names;
                # translate to the logical names the feed speaks
                inv = {p: l_ for l_, p in partition.mapping.items()}
                df = df.rename(columns=inv)
                df = df[[c for c in df.columns if c in cols]]
            for c in cols:            # pre-DDL files lack new columns
                if c not in df.columns:
                    df[c] = None
            df = df[cols]
            # canonicalize timestamps to UTC-aware BEFORE the diff: a
            # CONVERTed table mixes foreign annotations (INT96 / NTZ
            # read tz-NAIVE by pyarrow) with the engine's own
            # TIMESTAMP_MICROS (tz-aware) files.  Un-normalized, the
            # old/new comparison below sees naive != aware for the
            # SAME instant and emits a phantom update for every
            # unchanged row of a rewritten foreign file (reproduced);
            # concatenating them also breaks the final to_datetime.
            # The session is UTC-pinned, so naive values are UTC
            # instants and utc=True is value-preserving.
            for f in fields:
                if f.dataType.typeName() == "timestamp":
                    df[f.name] = pd.to_datetime(df[f.name], utc=True)
            return df

        old, new = load(partition.removed), load(partition.added)
        # deletion-vector context (mirrors TxLogTable.table_changes):
        # drop rows never live at v-1 from the old side, add grown-DV
        # before-images (dv-mode deletes change no files), drop rows
        # not live at v from the new side
        if partition.dv_old:
            old = old[~old[key].isin(partition.dv_old)]
        if partition.dv_grown:
            g = load(partition.grown_files)
            old = pd.concat(
                [old, g[g[key].isin(partition.dv_grown)]],
                ignore_index=True)
        if partition.dv_new:
            new = new[~new[key].isin(partition.dv_new)]
        if partition.dv_shrunk:
            s = load(partition.shrunk_files)
            new = pd.concat(
                [new, s[s[key].isin(partition.dv_shrunk)]],
                ignore_index=True)
        m = old.merge(new, on=key, how="outer",
                      suffixes=("_o", "_n"), indicator=True)

        # vectorized classification — no per-row Python: a commit's
        # change batch can be large, so the diff stays columnar all the
        # way and is handed to Spark as ONE Arrow batch
        import numpy as np
        import pyarrow as pa

        is_i = (m["_merge"] == "right_only").to_numpy()
        is_d = (m["_merge"] == "left_only").to_numpy()
        differs = np.zeros(len(m), dtype=bool)
        for c in data_cols:
            a, b = m[f"{c}_o"], m[f"{c}_n"]
            differs |= ~((a.isna() & b.isna())
                         | (a == b).fillna(False)).to_numpy()
        keep = is_i | is_d | differs
        mk = m.loc[keep]
        is_d, is_i = is_d[keep], is_i[keep]
        u_label = "U_post" if partition.full_images else "U"
        out = pd.DataFrame(index=mk.index)
        out["commit_version"] = np.int32(partition.version)
        out["change_type"] = np.where(is_i, "I",
                                      np.where(is_d, "D", u_label))
        out[key] = mk[key]
        for c in data_cols:             # before-image for D, after else
            out[c] = mk[f"{c}_n"].where(~is_d, mk[f"{c}_o"])
        if partition.full_images:
            # updates additionally emit their before-image as U_pre
            is_u = ~(is_d | is_i)
            mu = mk.loc[is_u]
            pre = pd.DataFrame(index=mu.index)
            pre["commit_version"] = np.int32(partition.version)
            pre["change_type"] = "U_pre"
            pre[key] = mu[key]
            for c in data_cols:
                pre[c] = mu[f"{c}_o"]
            out = pd.concat([out, pre], ignore_index=True)
        # outer-merge NaNs promote ints to float64; restore nullable
        # ints so the Arrow batch matches the declared Spark schema
        _pd_int = {"long": "Int64", "integer": "Int32",
                   "short": "Int16", "byte": "Int8"}
        for f in fields:
            tn = f.dataType.typeName()
            if tn in _pd_int:
                out[f.name] = out[f.name].astype(_pd_int[tn])
            elif tn == "timestamp":
                # Spark rejects Arrow ns timestamps; pin to µs UTC.
                # utc=True, not tz_localize: the old/new images come
                # from DIFFERENT parquet files, and a CONVERTed
                # foreign file can carry isAdjustedToUTC opposite to
                # the engine's own writes — the object column then
                # MIXES tz-aware and naive values and a plain
                # to_datetime raises ("Cannot mix tz-aware with
                # tz-naive").  The session is pinned UTC everywhere,
                # so naive values are UTC instants and utc=True
                # normalizes both kinds to the same domain.
                col = pd.to_datetime(out[f.name], utc=True)
                out[f.name] = col.astype("datetime64[us, UTC]")
        yield pa.RecordBatch.from_pandas(
            out.reset_index(drop=True), preserve_index=False)
