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
