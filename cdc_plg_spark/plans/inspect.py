"""Physical-plan inspection utilities.

The 100 TB mandate is enforced with assertions on the optimized plan:
filters must reach the parquet scan (PushedFilters), dimension joins
must broadcast, aggregates must have a map-side partial phase, top-k
must compile to TakeOrderedAndProject. tests/test_plans.py runs these
audits; operators cite them in docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() output as a string (mode: simple|extended|formatted|cost)."""
    sc = df.sparkSession._sc
    return sc._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode)


def assert_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    p = plan_str(df, mode)
    for n in needles:
        assert n in p, f"expected {n!r} in physical plan:\n{p}"
    return p


def assert_not_in_plan(df: DataFrame, *needles: str, mode: str = "formatted") -> str:
    p = plan_str(df, mode)
    for n in needles:
        assert n not in p, f"did not expect {n!r} in physical plan:\n{p}"
    return p


def plan_signature(df: DataFrame) -> dict[str, int]:
    """Compact plan fingerprint: physical operator name → count.

    Parsed from the formatted (pre-execution) explain, so it is
    deterministic for a fixed SF and session confs. The snapshot suite
    (tests/test_plan_snapshots.py) diffs these against checked-in
    baselines to catch silent plan regressions — a broadcast flipping
    to a shuffle join, an extra Exchange, a codegen'd expression
    falling back to an interpreted Python eval.
    """
    import re

    counts: dict[str, int] = {}
    for line in plan_str(df, "formatted").splitlines():
        m = re.match(r"^\s*\(\d+\)\s+([A-Za-z][A-Za-z0-9 ]*?)(?:\s*\[.*)?$",
                     line)
        if m:
            name = m.group(1).strip()
            counts[name] = counts.get(name, 0) + 1
    return counts


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of a scan node ('' if none)."""
    p = plan_str(df, "formatted")
    for line in p.splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""
