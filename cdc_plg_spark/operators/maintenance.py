"""Table-maintenance operators: small-file compaction.

A CDC sink that lands a micro-batch per trigger produces thousands of
small files per partition per day — the classic object-store pathology
(every file is a scan task + a metadata round-trip; 100 TB of 1 MB
files is 10^8 tasks). `compact_files` rewrites a parquet layout into
target-size files: read → repartition to ceil(bytes/target) →
write-over. This is the maintenance half of the reference's
object-store sink (/root/reference/README.md:23) — the flush contract
creates the small files, compaction amortizes them.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.registry import register


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_files(spark: SparkSession, path: str, target_bytes: int = 128 << 20,
                  sort_within_by: list[str] | None = None) -> int:
    """Rewrite the parquet layout at `path` into ~target_bytes files.

    Returns the new file count. `sort_within_by` optionally clusters
    rows inside each output file (repartitionByRange + sortWithinPartitions)
    so downstream scans get row-group min/max pruning on those columns.
    Writes to a sibling temp dir then swaps, so a failed compaction
    never destroys the source layout.
    """
    src_bytes = dir_bytes(path)
    n_out = max(1, math.ceil(src_bytes / target_bytes))
    df = spark.read.parquet(path)
    if sort_within_by:
        df = (df.repartitionByRange(n_out, *sort_within_by)
              .sortWithinPartitions(*sort_within_by))
    else:
        df = df.repartition(n_out)
    tmp = path.rstrip("/") + ".compacting"
    df.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (same filesystem)
    bak = path.rstrip("/") + ".old"
    os.rename(path, bak)
    os.rename(tmp, path)
    import shutil

    shutil.rmtree(bak)
    return sum(1 for _r, _d, fs in os.walk(path)
               for f in fs if f.endswith(".parquet"))


@register(
    "maintenance_compaction",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT event_id) AS n_ids,
           CAST(SUM(CAST(ROUND(value * 10000) AS BIGINT)) AS DOUBLE) / 10000
               AS sum_value
    FROM events
    """,
)
def maintenance_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction round-trip: fragment the events table into many small
    files (a simulated micro-batch sink output), compact to target
    size, and verify the data is bit-identical to the source. The
    oracle reads the ORIGINAL table — any row lost or duplicated by
    the rewrite mismatches."""
    from cdc_plg_spark.catalog import cache_dir

    frag = cache_dir("compact", sf_dir)
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", F.col("ts").cast("long").alias("ts_us"), "value")
    if not os.path.exists(frag):
        # 64 fragments stands in for 64 micro-batch commits
        ev.repartition(64).write.mode("overwrite").parquet(frag)
        compact_files(spark, frag, target_bytes=4 << 20,
                      sort_within_by=["event_id"])
    back = spark.read.parquet(frag)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("event_id").alias("n_ids"),
        (F.sum(F.round(F.col("value") * 10000).cast("long"))
         .cast("double") / 10000).alias("sum_value"))


@register(
    "audit_observe_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_quantity, 4) * 10000 AS BIGINT)) AS DOUBLE)
               / 10000 AS sum_qty,
           CAST(COUNT(CASE WHEN l_discount < 0 OR l_discount > 0.6
                           THEN 1 END) AS BIGINT) AS n_bad_discount,
           CAST(MAX(epoch_us(l_shipdate)) AS BIGINT) AS max_ship_us
    FROM lineitem
    """,
)
def audit_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality accounting via ``df.observe``: row
    count, exact quantity total, out-of-range discount count, and the
    high-water ship timestamp are collected as a SIDE EFFECT of one
    scan — no second pass, no separate audit query. This is the
    Spark-native form of the reference's flush accounting
    (FlushRowChangedEvents returns what was durably persisted,
    /root/reference/README.md:64): every pipeline write can carry its
    own verification metrics for free, which at 100 TB is the
    difference between auditing and re-reading the lake.

    The observed scan materializes through the noop sink (all
    compute, zero write I/O); the metrics row itself is the result."""
    from pyspark.sql import Observation

    li = load_table(spark, "lineitem", sf_dir)
    q = F.col("l_quantity") * 10000
    q_cents = (F.floor(F.abs(q) + F.lit(0.5)) * F.signum(q)).cast("long")
    obs = Observation("audit")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(q_cents).cast("double") / 10000).alias("sum_qty"),
        F.count(F.when((F.col("l_discount") < 0)
                       | (F.col("l_discount") > 0.6), 1))
         .alias("n_bad_discount"),
        F.max(F.unix_micros(F.col("l_shipdate").cast("timestamp")))
         .alias("max_ship_us"))
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["sum_qty"], m["n_bad_discount"], m["max_ship_us"])],
        "n_rows BIGINT, sum_qty DOUBLE, n_bad_discount BIGINT, "
        "max_ship_us BIGINT")


_Z_BITS = 8  # 8 bits per key -> 16-bit z-value, 256x256 grid


def _interleave_sql(nx: str, ny: str) -> str:
    """Portable bit-interleave expression (same text is valid Spark SQL
    and DuckDB SQL): x bits land on even positions, y bits on odd."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({nx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ny} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "maintenance_zorder_layout",
    oracle=f"""
    WITH bounds AS (
        SELECT MIN(l_orderkey) AS ok_lo, MAX(l_orderkey) AS ok_hi,
               MIN(l_partkey) AS pk_lo, MAX(l_partkey) AS pk_hi
        FROM lineitem),
    norm AS (
        SELECT l_orderkey, l_partkey,
               CAST(floor({(1 << _Z_BITS) - 1} * (l_orderkey - ok_lo)
                    / (ok_hi - ok_lo + 1.0)) AS BIGINT) AS nx,
               CAST(floor({(1 << _Z_BITS) - 1} * (l_partkey - pk_lo)
                    / (pk_hi - pk_lo + 1.0)) AS BIGINT) AS ny
        FROM lineitem CROSS JOIN bounds),
    z AS (
        SELECT l_orderkey, l_partkey, nx, ny,
               {_interleave_sql('nx', 'ny')} AS zval
        FROM norm)
    SELECT CAST(zval >> {2 * _Z_BITS - 4} AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(nx) AS BIGINT) AS ok_min, CAST(MAX(nx) AS BIGINT) AS ok_max,
           CAST(MIN(ny) AS BIGINT) AS pk_min, CAST(MAX(ny) AS BIGINT) AS pk_max
    FROM z
    GROUP BY 1
    """,
)
def maintenance_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering of a fact table on two join
    keys, summarized as per-file key bounding boxes — the
    multi-dimensional data-skipping layout every lakehouse engine
    OPTIMIZE ZORDER implements. Linear sort orders can cluster ONE
    key; interleaving the keys' bits makes files tight in BOTH
    dimensions, so parquet min/max stats prune scans filtered on
    either key (the test asserts the z-layout's normalized span
    product beats a single-key sort's).

    All JVM expression work: normalize each key to {_Z_BITS} bits
    against its global bounds (1-row broadcast), interleave with
    shift/mask arithmetic, bucket on the z-prefix (deterministic —
    unlike repartitionByRange, whose sampled boundaries would break
    the oracle), aggregate the box stats. At 100 TB the same zval
    column feeds ``repartitionByRange(zval).write`` to produce the
    physical files; the summary here is the skip-quality audit."""
    li = load_table(spark, "lineitem", sf_dir)
    hi = (1 << _Z_BITS) - 1
    bounds = li.agg(F.min("l_orderkey").alias("ok_lo"),
                    F.max("l_orderkey").alias("ok_hi"),
                    F.min("l_partkey").alias("pk_lo"),
                    F.max("l_partkey").alias("pk_hi"))
    norm = (li.select("l_orderkey", "l_partkey")
            .crossJoin(F.broadcast(bounds))
            .select(
                F.floor(hi * (F.col("l_orderkey") - F.col("ok_lo"))
                        / (F.col("ok_hi") - F.col("ok_lo") + 1.0))
                 .cast("long").alias("nx"),
                F.floor(hi * (F.col("l_partkey") - F.col("pk_lo"))
                        / (F.col("pk_hi") - F.col("pk_lo") + 1.0))
                 .cast("long").alias("ny")))
    z = norm.withColumn("zval", F.expr(_interleave_sql("nx", "ny")))
    return (z.groupBy(F.shiftright("zval", 2 * _Z_BITS - 4).cast("long")
                      .alias("file_id"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("nx").alias("ok_min"), F.max("nx").alias("ok_max"),
                 F.min("ny").alias("pk_min"), F.max("ny").alias("pk_max")))


@register(
    "maintenance_vacuum_versions",
    oracle="""
    WITH latest AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    SELECT CAST(2 AS BIGINT) AS versions_retained,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(event_id) AS BIGINT) AS key_checksum
    FROM latest WHERE rn = 1
    """,
    tags=("cdc", "maintenance"),
)
def maintenance_vacuum_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention vacuum over a versioned state table (the lakehouse
    VACUUM contract): materialize four cumulative state versions of
    the events changelog (one per week of commits, each version =
    latest-per-key over everything ≤ its cut), delete all but the
    newest 2, and prove the surviving HEAD still equals the full
    compaction — retention must never change current state, only
    forfeit time travel beyond the horizon.

    Scale: each version write is one latest-per-key shuffle over the
    prefix; the vacuum itself is pure manifest/directory work, no data
    pass — exactly how table-format VACUUM behaves."""
    import os as _os
    import shutil as _sh

    from cdc_plg_spark.catalog import cache_dir, load_table
    from pyspark.sql import Window as W

    base = cache_dir("vacuum_state", sf_dir)
    cuts = ("2024-01-08", "2024-01-15", "2024-01-22", "2099-01-01")
    if not _os.path.isdir(base):
        build = base + ".build"
        _sh.rmtree(build, ignore_errors=True)
        _os.makedirs(build)
        ev = load_table(spark, "events", sf_dir)
        w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
        for i, cut in enumerate(cuts):
            (ev.filter(F.col("ts") < cut)
               .withColumn("_r", F.row_number().over(w))
               .filter(F.col("_r") == 1).drop("_r")
               .write.mode("overwrite")
               .parquet(_os.path.join(build, f"state_{i}")))
        try:
            _os.rename(build, base)
        except OSError:
            _sh.rmtree(build, ignore_errors=True)  # concurrent builder won
    # vacuum: drop every version below the retention horizon (keep 2)
    versions = sorted(
        int(d.rsplit("_", 1)[1]) for d in _os.listdir(base)
        if d.startswith("state_"))
    for v in versions[:-2]:
        _sh.rmtree(_os.path.join(base, f"state_{v}"), ignore_errors=True)
    kept = sorted(
        int(d.rsplit("_", 1)[1]) for d in _os.listdir(base)
        if d.startswith("state_"))
    head = spark.read.parquet(_os.path.join(base, f"state_{kept[-1]}"))
    return head.agg(
        F.lit(len(kept)).cast("long").alias("versions_retained"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("event_id").alias("key_checksum"))
