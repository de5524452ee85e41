"""Plan-regression snapshots (SURVEY.md §7): every headline batch
query's physical plan must keep the operator profile it was tuned to —
same join strategies, same number of exchanges, no silent fallback out
of codegen into interpreted/Python eval.

On an INTENTIONAL plan change: `python scripts/gen_plan_snapshots.py`
and review the JSON diff in tests/plan_snapshots.json.
"""

from __future__ import annotations

import json
import os

import pytest

from cdc_plg_spark import registry
from cdc_plg_spark.plans.inspect import plan_signature

SNAP_PATH = os.path.join(os.path.dirname(__file__), "plan_snapshots.json")

with open(SNAP_PATH) as f:
    SNAPSHOTS: dict[str, dict[str, int]] = json.load(f)

registry.load_all()


@pytest.mark.parametrize("name", sorted(SNAPSHOTS))
def test_plan_signature_unchanged(spark, sf_small, name):
    df = registry.get(name).fn(spark, sf_small)
    got = plan_signature(df)
    want = SNAPSHOTS[name]
    assert got == want, (
        f"{name}: plan signature drifted.\n want={json.dumps(want, sort_keys=True)}\n"
        f"  got={json.dumps(got, sort_keys=True)}\n"
        "If intentional: python scripts/gen_plan_snapshots.py and review the diff.")


def test_no_python_eval_in_snapshot_set(spark, sf_small):
    """None of the snapshot queries may contain a row-at-a-time Python
    eval operator (BatchEvalPython) — Python crossings must be
    Arrow-batched (ArrowEvalPython) or absent."""
    offenders = {n: s for n, s in SNAPSHOTS.items() if "BatchEvalPython" in s
                 and n != "udf_scalar_py"}
    assert not offenders, offenders
