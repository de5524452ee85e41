"""Debezium-JSON and Maxwell-JSON wire decodes (functions/scalar.py).

Registration was deferred from r6 (drain-budget protection) and
landed in r7 with the DECODE_*_ORACLE strings pinned here, so the
driver now checks both at sf0.01.  This test keeps the independent
driver-style compare (assert_frames_match, bit-exact floats) against
the same DuckDB oracle SQL at sf0.001 AND sf0.01 — two SFs, where the
driver runs one.
"""
from __future__ import annotations

import pytest

from cdc_plg_spark.functions.scalar import (
    DECODE_DEBEZIUM_ORACLE,
    DECODE_MAXWELL_ORACLE,
    decode_debezium_json,
    decode_maxwell_json,
)
from cdc_plg_spark.testing import assert_frames_match, duckdb_conn

CASES = [
    ("decode_debezium_json", decode_debezium_json, DECODE_DEBEZIUM_ORACLE),
    ("decode_maxwell_json", decode_maxwell_json, DECODE_MAXWELL_ORACLE),
]


@pytest.mark.parametrize("name,fn,oracle",
                         CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_wire_decode_matches_oracle(spark, name, fn, oracle, sf_dir):
    spark_pdf = fn(spark, sf_dir).toPandas()
    assert len(spark_pdf) > 0
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


def test_wire_decodes_roundtrip_every_op(spark):
    """All three ops present and correctly mapped in both decodes."""
    for name, fn, _ in CASES:
        pdf = fn(spark, "/root/testdata/sf0.001").toPandas()
        assert set(pdf["op"]) == {"I", "U", "D"}, name
        # old_value only on updates
        upd = pdf["op"] == "U"
        assert pdf.loc[upd, "old_value"].notna().all(), name
        assert pdf.loc[~upd, "old_value"].isna().all(), name
