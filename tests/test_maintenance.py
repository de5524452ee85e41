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


def test_zorder_beats_single_key_sort_on_span_product(spark, sf_dir):
    """The point of z-ordering: per-file bounding boxes must be tight
    in BOTH keys. Compare the z-layout's mean normalized span product
    against a single-key (orderkey) sort layout with the same file
    count — the single-key layout leaves the second key's span at
    ~full width, so its product must be materially worse."""
    from pyspark.sql import functions as F

    from cdc_plg_spark.operators.maintenance import (_Z_BITS,
                                                     maintenance_zorder_layout)

    z = maintenance_zorder_layout(spark, sf_dir).collect()
    width = 1 << _Z_BITS

    def files_scanned(rows):
        """Mean number of files a min/max-stats pruner reads for a
        point filter, averaged over every value of BOTH dimensions.
        (Box *area* is partition-invariant — any equal split scores
        the same — but files-hit-per-filter is exactly what parquet
        stats pruning pays, and it is shape-sensitive.)"""
        per_ok = sum(sum(1 for r in rows if r.ok_min <= v <= r.ok_max)
                     for v in range(width)) / width
        per_pk = sum(sum(1 for r in rows if r.pk_min <= v <= r.pk_max)
                     for v in range(width)) / width
        return per_ok + per_pk

    z_quality = files_scanned(z)

    # single-key layout: same normalization, files cut on nx alone
    from cdc_plg_spark.catalog import load_table
    li = load_table(spark, "lineitem", sf_dir)
    hi = width - 1
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
    n_files = len(z)
    single = (norm.groupBy((F.col("nx") * n_files / width)
                           .cast("long").alias("file_id"))
              .agg(F.min("nx").alias("ok_min"), F.max("nx").alias("ok_max"),
                   F.min("ny").alias("pk_min"), F.max("ny").alias("pk_max"))
              .collect())
    single_quality = files_scanned(single)

    # z-order must materially cut either-dimension point-filter I/O
    # (16 files: z reads ~4+4, a single-key sort reads ~1+16)
    assert z_quality < 0.7 * single_quality, (z_quality, single_quality)
