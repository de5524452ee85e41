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
