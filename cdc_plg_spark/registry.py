"""Operator/query registry — the implementation contract of SURVEY.md §2.

Every operator in the inventory registers here under its stable ID:

    @register("agg_hash_groupby", oracle=\"\"\"SELECT ...\"\"\")
    def agg_hash_groupby(spark, sf_dir): ...

The driver harness (``__spark_entry__.py``) exposes the registry as
``queries()`` / ``oracle_sql()``; operators whose semantics DuckDB can't
express (streaming, approximate sketches, ML-backed LSH) register with
``oracle=None`` and get the driver's rows-only check.

Oracle-authoring discipline (FIXTURES.md "Oracle harness notes"):
- alias every computed column identically in Spark and SQL;
- round floating aggregates the same on both sides;
- cast integer SUMs to BIGINT in DuckDB (it widens to HUGEINT);
- never rely on row order.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# Modules that register queries on import (SURVEY.md §2 sections).
#
# ORDER MATTERS for the driver's correctness harness: it walks queries() in
# iteration order and stops after a fixed budget (~50 per round).  Final
# iteration order is computed by ``_ordered()`` below from the recorded
# CORRECTNESS_r*.json rounds (failed rows first, never-checked next,
# driver-green last); module order here decides priority *within* the
# never-checked bucket, so the riskiest / least-SQL-like families lead.
_QUERY_MODULES = (
    "cdc_plg_spark.operators.pipeline",
    "cdc_plg_spark.operators.dedup",
    "cdc_plg_spark.operators.similarity",
    "cdc_plg_spark.operators.udfs",
    "cdc_plg_spark.operators.multimodal",
    "cdc_plg_spark.operators.maintenance",
    "cdc_plg_spark.operators.cdc_apply",
    "cdc_plg_spark.operators.timeseries",
    "cdc_plg_spark.operators.subqueries",
    "cdc_plg_spark.streaming.queries",
    "cdc_plg_spark.sources.queries",
    "cdc_plg_spark.operators.analytics",
    "cdc_plg_spark.operators.analytics_tpch",
    "cdc_plg_spark.operators.sorts",
    "cdc_plg_spark.operators.setops",
    "cdc_plg_spark.functions.scalar",
    "cdc_plg_spark.operators.text",
    "cdc_plg_spark.flagship",
    "cdc_plg_spark.operators.relational",
    "cdc_plg_spark.operators.joins",
    "cdc_plg_spark.operators.aggregates",
    "cdc_plg_spark.operators.windows",
    # round-5 additions register LAST: new queries enter the driver's
    # never-checked bucket, and the 30 queries already waiting there
    # must keep their budget priority (VERDICT r4 task 1)
    "cdc_plg_spark.operators.lakehouse",
)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Rounds strictly before this one ran with a different global read path
# (round 3 flipped inferTimestampNTZ + regenerated fixtures to µs), so a
# green recorded earlier doesn't prove the query is green NOW.  Bump this
# whenever a change affects every query's inputs (conf/fixture migration)
# so stale greens rotate back through the driver's budget.
_TRUSTED_GREEN_MIN_ROUND = 3

# Queries whose IMPLEMENTATION materially changed this round: their old
# driver-green rows no longer prove the current code, so they re-enter
# the never-checked bucket.  Clear entries once the driver re-records
# them.  r10: all 26 r9-forced ids (the two de-hinted broadcasts + the
# 24 TxLog read-path ids re-proven after the manifest-tuple rewrite)
# were re-recorded green in CORRECTNESS_r09 and are CLEARED (VERDICT
# r9 task 1).  With the set empty, _ordered()'s age rotation fills the
# driver budget with the oldest-green ids (~44 r4-latest), retiring
# every pre-r5 green.  Force FINELY this round per VERDICT r9 task 8:
# only ids whose PLAN a change actually touches; refusal-path-only or
# maintenance-path (clone copy, fsck) edits don't force.
# r10 session 2: lakehouse_bloom_point_read's dataflow changed (24
# bits/key, min-over-3-probes absent claim — the 10-bit single-probe
# version was FP-flaky under session-order-dependent range-partition
# sampling), so the driver re-proves it.  The seal/fsck additions are
# maintenance-path and force nothing.
# r11: lakehouse_bloom_point_read re-recorded hash-green in
# CORRECTNESS_r10 — CLEARED (VERDICT r10 task 3).  One new force:
# sample_temperature_mix's threshold math moved from double-division
# + cast-truncation to integer `div` (VERDICT r10 task 4 / ADVICE),
# changing the produced expression, so the driver re-proves it.  The
# lakehouse fsck/stamp_hashes robustness edits (unreadable-file
# marker, missing-file re-snapshot retry) are audit/maintenance-path
# and force nothing.  With one slot taken, the age rotation drains
# the r5-latest tail (~36 ids) plus the oldest r6 greens.
# r11 session 2: agg_minmax_by's produced expression changed (tie-
# deterministic order-preserving integer encode replacing plain
# max_by/min_by — the sf1 sweep exposed nondeterministic arg
# selection under price ties), so the driver re-proves it.  The new
# lakehouse_sql_convert_layout exhibit is never-checked and slots
# first by construction.
# r12: sample_temperature_mix and agg_minmax_by re-recorded hash-green
# in CORRECTNESS_r11 — CLEARED (VERDICT r11 task 2).  One new force:
# lakehouse_sql_convert_layout, the r11 red (hash flake, rows/schema
# green; unreproduced in 32+ re-runs).  Its dataflow changed twice
# this round — the raw dump is hash-partitioned on doc_id instead of
# round-robin, and the REPARTITION leg now runs under the
# refuse-to-publish content-fingerprint gate (_verify_layout_rewrite)
# — so the driver re-proves it (VERDICT r11 tasks 1+2).  And
# agg_minmax_by re-enters: ADVICE r11's medium finding (the encode's
# documented domain bound was 10x too generous; silent BIGINT wrap
# beyond it) is now a per-row assert_true guard inside the encode —
# expression changed, driver re-proves.
# r12 session 2: the sf1 rows-only sweep (VERDICT r11 task 4) caught
# both production ANN paths returning 0 rows at sf1 — their in-plan
# recall gates fired on the decorrelated 10x corpus (the designed
# failure mode: empty result, never silent bad recall).  Retuned:
# IVF K 16→32 / nprobe 6→12 (same scan fraction), PQ 8→16 subspaces +
# corpus-scaled shortlist.  All three produced expressions changed, so
# the driver re-proves them (sim_ann_ivf_checked is the hash-oracled
# dataflow twin; the other two are rows-only by §2 contract).
# r12 session 2 (cont.): lakehouse_sql_maintenance_audit's OPTIMIZE
# now runs under VERIFY (the r12 layout publish gate, exercised on
# the driver path at audit cadence) — dataflow changed, driver
# re-proves it.
_FORCE_RECHECK: set[str] = {"lakehouse_sql_convert_layout",
                            "agg_minmax_by", "sim_ann_ivf",
                            "sim_ann_pq", "sim_ann_ivf_checked",
                            "lakehouse_sql_maintenance_audit"}


def _round_of(path: str) -> int:
    import re

    m = re.search(r"_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def _driver_rows() -> dict[str, tuple[int, dict]]:
    """Latest driver CORRECTNESS row per query as (round, row).

    Numeric round sort, not lexicographic — r100 must beat r99."""
    rows: dict[str, tuple[int, dict]] = {}
    paths = sorted(glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json")),
                   key=_round_of)
    for path in paths:
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            rnd = _round_of(path)
            rows.update({k: (rnd, v) for k, v in data.items()
                         if isinstance(v, dict)})
    return rows


def _ordered() -> list[Query]:
    """Registry entries in driver-priority order.

    The driver's correctness harness walks queries() in iteration order and
    stops after a fixed per-round budget, so ordering decides what gets
    (re-)verified.  Buckets: (0) queries whose latest driver row failed —
    recheck immediately; (1) queries with no driver row yet; (2) queries
    green only under a pre-migration read path (round <
    _TRUSTED_GREEN_MIN_ROUND) — re-verify; (3) trusted driver-green
    queries.  Within bucket 3 the secondary key is the LATEST-CHECK ROUND
    (oldest first), so freshness rotation is automatic: once the stale
    buckets drain, the driver budget refills with the longest-unverified
    greens instead of whatever module registration order favored
    (VERDICT r7 task 2).  The sort is stable, so registration
    (module-priority) order still breaks ties within a round.
    """
    rows = _driver_rows()

    def key(q: Query) -> tuple[int, int]:
        if q.name in _FORCE_RECHECK:
            return (1, 0)
        hit = rows.get(q.name)
        if hit is None:
            return (1, 0)
        rnd, r = hit
        # a rows-only pass only counts for queries that still have no
        # oracle: once a query GAINS an oracle, its old weak row no
        # longer proves anything — re-verify like never-checked
        green = r.get("hash_match") is True or (
            r.get("err") == "no_oracle" and r.get("spark_rows") is not None
            and q.oracle is None
        )
        if not green:
            return (1, 0) if r.get("err") == "no_oracle" else (0, 0)
        return (3, rnd) if rnd >= _TRUSTED_GREEN_MIN_ROUND else (2, rnd)

    return sorted(_REGISTRY.values(), key=key)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags,
                                doc=(fn.__doc__ or "").strip())
        return fn

    return deco


def load_all() -> None:
    """Import every query module (idempotent)."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # tolerate not-yet-built stages so the registry is usable mid-build
            if e.name and e.name.startswith("cdc_plg_spark"):
                continue
            raise


def queries() -> dict[str, QueryFn]:
    load_all()
    return {q.name: q.fn for q in _ordered()}


def oracle_sql() -> dict[str, str]:
    load_all()
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


def get(name: str) -> Query:
    load_all()
    return _REGISTRY[name]


def all_entries() -> dict[str, Query]:
    load_all()
    return {q.name: q for q in _ordered()}
