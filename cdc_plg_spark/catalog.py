"""Table catalog over the parquet test fixtures.

Maps the fixture star schema (TESTDATA.md / FIXTURES.md) to DataFrames.
At 100 TB the same loader points at partitioned object-store prefixes —
the parquet scan benefits from Catalyst predicate pushdown, column
pruning, and (when the layout is partitioned by e.g. (table, date) —
SURVEY.md §4 partition-pruning row) static + dynamic partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Columns stored as parquet TIMESTAMP(NANOS): Spark's reader has no ns
# timestamp type, so session.py sets nanosAsLong and we rebuild a µs
# TimestampType here (fixture values are µs-precision; see FIXTURES.md).
_NANOS_TS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


# Session confs the engine depends on regardless of who built the
# SparkSession (the driver harness passes its own): every entry is a
# dynamic SQL conf, settable at runtime.
_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # fixture timestamps are µs isAdjustedToUTC=false: read as plain
    # TimestampType (not NTZ) so event-time ops and pushdown both work
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    # engine semantics are permissive-SQL (Spark 4 defaults ANSI on;
    # oracle parity and hash wraparound both assume non-ANSI)
    "spark.sql.ansi.enabled": "false",
    # size shuffles to the box, not Spark's 200 default: AQE coalesces
    # batch plans anyway, but STREAMING aggs lock the state fan-out to
    # this value at first checkpoint — 200 near-empty state partitions
    # per query is pure overhead at fixture scale (scale runs override
    # per deployment)
    "spark.sql.shuffle.partitions": str(os.cpu_count() or 32),
}


def _is_utc_equivalent(tz: str) -> bool:
    """True when the session zone keeps a fixed +00:00 offset, i.e. the
    NTZ→TIMESTAMP cast below is value-preserving.  Accepts every UTC
    spelling Spark does (region ids like Etc/Universal, fixed offsets
    like +00:00 / GMT+0 / Z) instead of a brittle allowlist; a region
    zone counts only if its offset is zero across the fixture date range
    (no DST excursions)."""
    import re

    s = (tz or "").strip()
    if not s:
        return False
    if s.upper() in ("Z", "UT", "UTC", "GMT"):
        return True
    m = re.fullmatch(
        r"(?:UTC|GMT|UT)?([+-])(\d{1,2})(?::?(\d{2}))?(?::?(\d{2}))?", s,
        re.IGNORECASE)
    if m:
        return not any(int(g or 0) for g in m.groups()[1:])
    try:
        from zoneinfo import ZoneInfo
        zone = ZoneInfo(s)
    except Exception:
        return False
    from datetime import datetime, timedelta, timezone
    probes = [datetime(y, mth, 1, tzinfo=timezone.utc)
              for y in (1992, 1998, 2020, 2026) for mth in (1, 7)]
    return all(zone.utcoffset(dt) == timedelta(0) for dt in probes)


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one fixture table by name from a scale-factor directory.

    The analyzed base DataFrame is memoized per (session, table, dir):
    ``spark.read.parquet`` re-lists the path and re-infers the schema
    from footers on EVERY call (~120 ms even for a single file), which
    dominated query build time when each registry query loads 2-5
    tables.  DataFrames are immutable, so reuse is safe; the cache
    lives on the session object so its lifetime tracks the session.
    In production the same role is played by a metastore/catalog table
    whose schema is known without per-query inference."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_confs(spark)
    cache: dict | None = getattr(spark, "_cdc_df_cache", None)
    if cache is None:
        cache = {}
        try:
            spark._cdc_df_cache = cache
        except AttributeError:  # exotic session proxy; degrade to uncached
            pass
    hit = cache.get((name, sf_dir))
    if hit is not None:
        return hit
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANOS_TS_COLUMNS.get(name, ()):
        if dict(df.dtypes).get(c) == "bigint":
            # `div` = integer division: ns values exceed double's 2^53
            # exact-integer range, so float division would drift by ±1µs
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Defense for driver-owned sessions where inferTimestampNTZ couldn't be
    # flipped before this read was planned: NTZ wall-clock == UTC instant
    # ONLY under a UTC session — guard that, or the cast would silently
    # shift instants. Fixtures hold no nested timestamps (asserted in
    # tests/test_catalog.py), so top-level dtypes are sufficient.
    if any(t == "timestamp_ntz" for _, t in df.dtypes):
        tz = spark.conf.get("spark.sql.session.timeZone", "")
        if not _is_utc_equivalent(tz):
            raise RuntimeError(
                f"timestamp_ntz fixture read under non-UTC session ({tz!r});"
                " cast would shift instants")
        for c, t in df.dtypes:
            if t == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
    cache[(name, sf_dir)] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table; also registers each as a temp view so
    the SQL surface (spark.sql) sees the same catalog as the DataFrame
    API."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# bump when any cached-artifact format changes: derived artifacts in
# /tmp (text round-trips, bucketed tables, compaction fragments) are
# reused across runs, and a stale layout must never satisfy a newer
# operator.  v4: fixtures regenerated with µs/NTZ timestamps (was ns).
# v5: streaming sentinels rewritten in µs TIMESTAMP (were ns BIGINT —
# stale stream_staged dirs would collapse stream event-time into 1970).
CACHE_VERSION = 5


def cache_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(kind, sf, version) scratch dir for derived
    artifacts that are expensive to rebuild per run."""
    import tempfile

    sf_tag = sf_dir.rstrip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(),
                        f"cdc_{kind}_v{CACHE_VERSION}{sf_tag}")
