"""Fixture/catalog contracts the read path depends on."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from cdc_plg_spark.catalog import TABLES, load_table


def _has_nested_timestamp(t) -> bool:
    import pyarrow as pa

    if pa.types.is_timestamp(t):
        return True
    if pa.types.is_struct(t) or pa.types.is_list(t) or pa.types.is_large_list(t):
        return any(_has_nested_timestamp(f.type) for f in t) if pa.types.is_struct(t) \
            else _has_nested_timestamp(t.value_type)
    if pa.types.is_map(t):
        return _has_nested_timestamp(t.key_type) or _has_nested_timestamp(t.item_type)
    return False


@pytest.mark.parametrize("table", TABLES)
def test_no_nested_timestamps_in_fixtures(table, sf_dir):
    """catalog.load_table's NTZ defense inspects only TOP-LEVEL dtypes;
    this pins the assumption that no fixture hides a timestamp inside a
    struct/array/map where the cast would miss it."""
    schema = pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    for field in schema:
        t = field.type
        import pyarrow as pa
        if pa.types.is_timestamp(t):
            continue  # top-level timestamps are handled
        assert not _has_nested_timestamp(t), (
            f"{table}.{field.name}: nested timestamp invisible to the "
            f"top-level NTZ defense in catalog.load_table")


@pytest.mark.parametrize("table", TABLES)
def test_load_table_no_ntz_surface(table, spark, sf_dir):
    """Every fixture loads with plain TIMESTAMP (never timestamp_ntz) so
    event-time ops and oracle parity agree on instants."""
    df = load_table(spark, table, sf_dir)
    assert not any(t == "timestamp_ntz" for _, t in df.dtypes), df.dtypes


def test_parse_spark_bytes_suffixes():
    from cdc_plg_spark.catalog import _parse_spark_bytes

    assert _parse_spark_bytes("134217728") == 128 << 20
    assert _parse_spark_bytes("134217728b") == 128 << 20
    assert _parse_spark_bytes("16m") == 16 << 20
    assert _parse_spark_bytes("128MB") == 128 << 20
    assert _parse_spark_bytes("4mb") == 4 << 20
    assert _parse_spark_bytes("1g") == 1 << 30
    assert _parse_spark_bytes("2k") == 2048
    assert _parse_spark_bytes(" 7 ") == 7


def test_scan_splits_estimate_tracks_rdd_probe(spark, sf_dir):
    """The FilePartition-formula estimate must agree with the exact
    (but plan-to-RDD-paying) probe closely enough for 'enough
    parallelism?' guards: same order of magnitude, and NEVER low
    enough vs cores to flip a should-repartition decision into a
    skip.  Overcount by ~1 split (open-cost padding counted per file
    vs Spark's smarter packer) is the accepted slack."""
    from cdc_plg_spark.catalog import load_table, scan_splits_estimate

    cores = spark.sparkContext.defaultParallelism
    for t in ("events", "lineitem", "region"):
        df = load_table(spark, t, sf_dir)
        est = scan_splits_estimate(spark, df)
        real = df.rdd.getNumPartitions()
        assert real <= est <= max(2 * real, real + 1), (t, est, real)
        # the guard decision (est < cores) matches the real decision
        assert (est < cores) == (real < cores), (t, est, real)


def test_scan_splits_estimate_nonlocal_scheme_skips_guard(spark):
    """Files whose bytes can't be statted locally (object-store URIs)
    must yield a huge estimate so the repartition guard conservatively
    does NOT add a shuffle — the correct default at the scales where
    non-local storage appears."""
    from unittest import mock

    from cdc_plg_spark.catalog import load_table, scan_splits_estimate

    df = load_table(spark, "events", "/root/testdata/sf0.001")
    with mock.patch.object(
            type(df), "inputFiles",
            return_value=["s3://bucket/events.parquet"]):
        assert scan_splits_estimate(spark, df) >= (1 << 30)
