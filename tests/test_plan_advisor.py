"""Plan-advisor unit behavior + the fleet-wide scale lint."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_plg_spark.catalog import load_table
from cdc_plg_spark.plans.advisor import advise, criticals

from scripts.gen_plan_snapshots import SNAPSHOT_QUERIES


def test_flags_cartesian(spark, sf_small):
    a = load_table(spark, "nation", sf_small)
    b = load_table(spark, "region", sf_small)
    # hint forces the true shuffle cartesian; without it Spark
    # broadcasts the small side (flagged by the cross-join warn rule)
    bad = a.crossJoin(b.hint("shuffle_replicate_nl"))
    assert any(f.rule == "cartesian-product" for f in advise(bad))
    soft = a.crossJoin(b).filter(F.col("n_name") != F.col("r_name"))
    assert any(f.rule == "broadcast-cross-join" for f in advise(soft))


def test_flags_single_partition_window(spark, sf_small):
    o = load_table(spark, "orders", sf_small)
    w = Window.orderBy("o_orderkey")  # no partitionBy: global window
    bad = o.withColumn("rn", F.row_number().over(w))
    assert any(f.rule == "single-partition-exchange" for f in advise(bad))


def test_flags_row_python_udf(spark, sf_small):
    from pyspark.sql.functions import udf

    @udf("long")
    def slow(x):
        return x + 1

    bad = load_table(spark, "orders", sf_small).select(slow("o_orderkey"))
    assert any(f.rule == "row-python-udf" for f in advise(bad))


def test_clean_plan_has_no_findings_above_info(spark, sf_small):
    from cdc_plg_spark.flagship import flagship

    assert criticals(flagship(spark, sf_small)) == []


# Every snapshot (batch, deterministic) query must be free of critical
# scale antipatterns. Additions to the registry get linted here even
# before a dedicated plan assertion exists. Justified exceptions go in
# the allowlist WITH a reason.
ALLOWED_CRITICALS: dict[str, str] = {
    "analytics_cumulative_distinct_users": (
        "the global cumulative window consumes ONE ROW PER DAY (the "
        "upstream aggregate collapses to day grain), so the single "
        "partition holds |calendar days| rows regardless of corpus "
        "size"),
}


@pytest.mark.parametrize("name", SNAPSHOT_QUERIES)
def test_fleet_no_critical_findings(spark, sf_small, name):
    from cdc_plg_spark import registry

    df = registry.get(name).fn(spark, sf_small)
    found = criticals(df)
    if name in ALLOWED_CRITICALS:
        pytest.skip(f"allowlisted: {ALLOWED_CRITICALS[name]}")
    assert found == [], f"{name}: {found}"
