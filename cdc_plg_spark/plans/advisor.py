"""Plan advisor: lint a DataFrame's physical plan for patterns that
break at cluster scale.

`tests/test_plans.py` asserts specific plans; this module is the
GENERIC tool — point it at any query (including user-authored ones)
and it returns structured findings, the way a warehouse's query
advisor annotates a profile. The fleet test
(tests/test_plan_advisor.py) runs it across every snapshot query, so
a new operator that introduces a driver bottleneck fails CI even
before anyone writes a dedicated plan assertion for it.

Levels:
- critical — will not survive a 100 TB input (single-partition
  exchange, cartesian product over unbounded sides);
- warn     — scale tax that needs a justification (row-at-a-time
  Python, global sort without a limit);
- info     — worth a look (scan with nothing pushed down).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from cdc_plg_spark.plans.inspect import plan_str


@dataclass(frozen=True)
class Finding:
    level: str  # "critical" | "warn" | "info"
    rule: str
    detail: str


def _single_partition_consumers(plan: str) -> list[str]:
    """Names of the operators consuming each SinglePartition exchange.

    Works on the formatted explain: the tree section gives parentage by
    indentation, the details section says which Exchange nodes are
    SinglePartition."""
    sp_ids = set()
    for block in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) (?:Exchange|ShuffleQueryStage)", block)
        if m and "SinglePartition" in block:
            sp_ids.add(m.group(1))
    if not sp_ids:
        return []
    consumers = []
    tree: list[tuple[int, str]] = []  # (indent, node text)
    for line in plan.splitlines():
        if re.match(r"^\(\d+\) ", line):
            break  # details section begins
        m = re.match(r"^([:+\-| ]*)(\*?\(?\d*\)? ?[A-Za-z][\w ]*)\((\d+)\)",
                     line)
        if not m:
            continue
        indent = len(m.group(1))
        name = m.group(2).strip().lstrip("*(0123456789) ").strip()
        node_id = m.group(3)
        if node_id in sp_ids:
            parent = next((n for i, n in reversed(tree) if i < indent), "")
            consumers.append(parent or "<root>")
        tree.append((indent, name))
    return consumers


def advise(df: DataFrame) -> list[Finding]:
    p = plan_str(df, "formatted")
    out: list[Finding] = []

    if "CartesianProduct" in p:
        out.append(Finding(
            "critical", "cartesian-product",
            "CartesianProduct multiplies both inputs; at scale this is "
            "|A| x |B| rows. Add a join condition or broadcast a "
            "provably-small side."))

    if "BroadcastNestedLoopJoin Cross" in p and "CartesianProduct" not in p:
        out.append(Finding(
            "warn", "broadcast-cross-join",
            "cross join via BroadcastNestedLoopJoin: bounded by the "
            "broadcast side fitting in executor memory — fine for a "
            "provably small side (e.g. a query set), fatal otherwise."))

    for consumer in _single_partition_consumers(p):
        # a single-partition exchange feeding a FINAL aggregate is the
        # normal global-agg shape: its input is one pre-reduced row per
        # upstream partition, not the dataset
        if "Aggregate" in consumer:
            continue
        out.append(Finding(
            "critical", "single-partition-exchange",
            f"all rows funnel through ONE task into {consumer!r} "
            "(usually a window or sort with no PARTITION BY). "
            "Partition by a key, or use TakeOrderedAndProject-style "
            "operators for global top-k."))

    if "BatchEvalPython" in p:
        out.append(Finding(
            "warn", "row-python-udf",
            "row-at-a-time Python UDF: one interpreter crossing per "
            "row. Prefer built-in expressions or an Arrow-batched "
            "pandas UDF (ArrowEvalPython)."))

    # a global Sort ("Sort [...], true, 0") that isn't the collapsed
    # TakeOrderedAndProject form materializes a full range-partitioned
    # sort of the whole input
    if re.search(r"\bSort \[[^\]]*\], true, 0", p) and \
            "TakeOrderedAndProject" not in p:
        out.append(Finding(
            "warn", "global-sort",
            "global ORDER BY without a limit range-shuffles and sorts "
            "the ENTIRE dataset. If only the top rows matter, sort "
            "with a LIMIT; if per-group order suffices, use a window."))

    for m in re.finditer(r"PushedFilters: \[\]", p):
        out.append(Finding(
            "info", "no-pushdown-scan",
            "a parquet scan has no pushed filters; fine for full "
            "scans, but if the query filters this table the predicate "
            "is being evaluated post-scan."))
        break  # one finding per plan is enough signal

    return out


def criticals(df: DataFrame) -> list[Finding]:
    return [f for f in advise(df) if f.level == "critical"]
