"""Differential tests: every SQL-oracle query vs DuckDB (driver mirror).

Parametrized over the full registry; queries without an oracle get a
rows-only sanity run. This is the local twin of CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import pytest

from cdc_plg_spark import registry
from cdc_plg_spark.testing import check_query

registry.load_all()
ALL = sorted(registry.all_entries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, sf_dir, name):
    check_query(spark, name, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"mktsegment", "n_users", "n_purchasers", "sum_value"}


def test_oracle_no_hugeint_output():
    """Registry-wide oracle typing lint (VERDICT r12 task 2).

    DuckDB widens an uncast integer SUM to HUGEINT, which lands in
    pandas as float64 while Spark returns int64 — the driver's raw
    value hash then sees 5000 vs 5000.0 and reds the round even though
    a float-tolerant local compare passes (the exact failure mode of
    lakehouse_sql_convert_layout in r11/r12).  DESCRIBE binds every
    oracle against the sf0.001 fixtures without executing it and fails
    on any HUGEINT/INT128 output column.
    """
    from cdc_plg_spark.testing import duckdb_conn

    con = duckdb_conn("/root/testdata/sf0.001")
    try:
        bad = []
        for name in ALL:
            sql = registry.get(name).oracle
            if not sql:
                continue
            for row in con.execute(f"DESCRIBE {sql}").fetchall():
                col, typ = row[0], str(row[1]).upper()
                if "HUGEINT" in typ or "INT128" in typ:
                    bad.append((name, col, typ))
    finally:
        con.close()
    assert not bad, (
        f"oracle columns typed HUGEINT (will red the driver hash — "
        f"CAST(SUM(...) AS BIGINT) them): {bad}")


def test_registry_contract():
    qs = registry.queries()
    os_ = registry.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
