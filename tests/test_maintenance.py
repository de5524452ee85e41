"""compact_files unit behavior: file-count reduction, integrity, and
range clustering for row-group pruning."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from cdc_plg_spark.operators.maintenance import compact_files, dir_bytes


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="cdc_maint_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _parquet_files(path):
    return [os.path.join(r, f) for r, _d, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")]


def test_compact_reduces_file_count_keeps_data(spark, tdir):
    src = os.path.join(tdir, "t")
    df = spark.range(0, 100_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(src)
    assert len(_parquet_files(src)) == 40
    before_sum = spark.read.parquet(src).agg(F.sum("v")).collect()[0][0]

    n_files = compact_files(spark, src, target_bytes=dir_bytes(src))
    assert n_files < 40
    after = spark.read.parquet(src)
    assert after.count() == 100_000
    assert after.agg(F.sum("v")).collect()[0][0] == before_sum
    assert not os.path.exists(src + ".compacting")
    assert not os.path.exists(src + ".old")


def test_compact_range_clustering_prunes(spark, tdir):
    """sort_within_by clusters ids: a selective id filter must read a
    strict subset of row groups (min/max pruning), observable via the
    pushed-filter scan returning quickly AND the per-file id ranges
    being disjoint."""
    import pyarrow.parquet as pq

    src = os.path.join(tdir, "t")
    spark.range(0, 200_000).withColumn(
        "v", F.col("id") % 7).repartition(16).write.parquet(src)
    compact_files(spark, src, target_bytes=dir_bytes(src) // 4,
                  sort_within_by=["id"])

    ranges = []
    for f in _parquet_files(src):
        md = pq.ParquetFile(f).metadata
        ids = [md.row_group(i).column(0) for i in range(md.num_row_groups)]
        # column 0 is `id` (schema order preserved)
        lo = min(c.statistics.min for c in ids)
        hi = max(c.statistics.max for c in ids)
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 2
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert lo_next > hi_prev, f"file id ranges overlap: {ranges}"
