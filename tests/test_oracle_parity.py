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


def test_registry_contract():
    qs = registry.queries()
    os_ = registry.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) > 0
