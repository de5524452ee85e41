"""Format-exhibit queries (operators/lakehouse.py tail section).

Seven lakehouse capabilities — bloom point reads, temporal skipping,
retention predicate-DELETE, RESTORE round trip, partial-column MERGE,
generated-column derived partition pruning, type widening —
implemented in r7 as driver-checkable queries (registration deferred
then to protect the freshness drain, VERDICT r6 #1) and REGISTERED in
r8 with the LAKEHOUSE_*_ORACLE strings pinned here (VERDICT r7 task 1).
This test runs the exact driver-style compare (assert_frames_match,
bit-exact floats) against the same DuckDB oracle SQL at sf0.001 and
sf0.01 — the local twin of the driver's CORRECTNESS row.
"""
from __future__ import annotations

import pytest

from cdc_plg_spark.operators.lakehouse import (
    LAKEHOUSE_BLOOM_POINT_ORACLE,
    LAKEHOUSE_CONVERT_GENERATED_ORACLE,
    LAKEHOUSE_DEFAULTS_ORACLE,
    LAKEHOUSE_FSCK_ORACLE,
    LAKEHOUSE_GENERATED_ORACLE,
    LAKEHOUSE_PARTIAL_MERGE_ORACLE,
    LAKEHOUSE_RESTORE_ORACLE,
    LAKEHOUSE_RETENTION_ORACLE,
    LAKEHOUSE_SEAL_ORACLE,
    LAKEHOUSE_TEMPORAL_SKIP_ORACLE,
    LAKEHOUSE_WIDENING_ORACLE,
    lakehouse_bloom_point_read,
    lakehouse_column_defaults,
    lakehouse_convert_generated,
    lakehouse_fsck_foreign_writer,
    lakehouse_fsck_hash_seal,
    lakehouse_generated_pruning,
    lakehouse_partial_merge,
    lakehouse_restore_roundtrip,
    lakehouse_retention_delete,
    lakehouse_temporal_skipping,
    lakehouse_type_widening,
)
from cdc_plg_spark.testing import assert_frames_match, duckdb_conn

CASES = [
    ("lakehouse_bloom_point_read", lakehouse_bloom_point_read,
     LAKEHOUSE_BLOOM_POINT_ORACLE),
    ("lakehouse_temporal_skipping", lakehouse_temporal_skipping,
     LAKEHOUSE_TEMPORAL_SKIP_ORACLE),
    ("lakehouse_retention_delete", lakehouse_retention_delete,
     LAKEHOUSE_RETENTION_ORACLE),
    ("lakehouse_restore_roundtrip", lakehouse_restore_roundtrip,
     LAKEHOUSE_RESTORE_ORACLE),
    ("lakehouse_partial_merge", lakehouse_partial_merge,
     LAKEHOUSE_PARTIAL_MERGE_ORACLE),
    ("lakehouse_generated_pruning", lakehouse_generated_pruning,
     LAKEHOUSE_GENERATED_ORACLE),
    ("lakehouse_type_widening", lakehouse_type_widening,
     LAKEHOUSE_WIDENING_ORACLE),
    ("lakehouse_convert_generated", lakehouse_convert_generated,
     LAKEHOUSE_CONVERT_GENERATED_ORACLE),
    ("lakehouse_column_defaults", lakehouse_column_defaults,
     LAKEHOUSE_DEFAULTS_ORACLE),
    ("lakehouse_fsck_foreign_writer", lakehouse_fsck_foreign_writer,
     LAKEHOUSE_FSCK_ORACLE),
    ("lakehouse_fsck_hash_seal", lakehouse_fsck_hash_seal,
     LAKEHOUSE_SEAL_ORACLE),
]


@pytest.mark.parametrize("name,fn,oracle",
                         CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_exhibit_matches_oracle(spark, name, fn, oracle, sf_dir):
    spark_pdf = fn(spark, sf_dir).toPandas()
    assert len(spark_pdf) > 0
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)


def test_exhibit_booleans_are_measured_true(spark):
    """The scale-claims (bloom beats range, temporal skip, whole-file
    drop, restore nets empty) must hold as MEASURED booleans, not just
    match an oracle that also says TRUE — a regression that flips one
    to False would fail the oracle compare above too, but this spells
    the claims out for the reader."""
    sf = "/root/testdata/sf0.01"
    b = lakehouse_bloom_point_read(spark, sf).head()
    assert b["bloom_beats_range"] and b["absent_reads_zero_files"]
    t = lakehouse_temporal_skipping(spark, sf).head()
    assert t["temporal_skips_half"] and t["rows_matching"] > 0
    r = lakehouse_retention_delete(spark, sf).head()
    assert r["dropped_whole_files"] and r["feed_deletes"] > 0
    g = lakehouse_generated_pruning(spark, sf).head()
    assert g["derived_prune_skips"] and g["computed_matches_expr"]
    assert g["rows_matching"] > 0
    w = lakehouse_type_widening(spark, sf).head()
    assert w["widen_moved_zero_bytes"] and w["old_files_read_wide"]
    f = lakehouse_fsck_foreign_writer(spark, sf).head()
    assert f["healthy_at_create"] and f["shallow_blind_to_same_size"]
    assert f["deep_flags_foreign_writer"] and f["healed_after_rewrite"]
