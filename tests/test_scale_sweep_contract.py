"""Contract pins for scripts/scale_value_sweep.py: its skip and
distribution-pinned id lists must track the registry, or the sweep
silently stops covering (a renamed exhibit would fall out of the
claim-drop path and re-fail on layout booleans, or a dead id would
sit in a skip list implying coverage that no longer exists)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cdc_plg_spark import registry
from scripts.scale_value_sweep import (DISTRIBUTION_PINNED_CLAIMS,
                                       SKIP_BY_DESIGN)

registry.load_all()
ENTRIES = registry.all_entries()


def test_skip_by_design_ids_exist():
    missing = SKIP_BY_DESIGN - set(ENTRIES)
    assert not missing, f"skip list names dead ids: {missing}"


def test_distribution_pinned_ids_exist_with_oracles():
    for name in DISTRIBUTION_PINNED_CLAIMS:
        assert name in ENTRIES, name
        assert ENTRIES[name].oracle, (
            f"{name} has no oracle — values-only compare is moot")


def test_distribution_pinned_claim_columns_in_oracle():
    """Every claim column the sweep drops must appear in the oracle
    SQL text — if an exhibit renames its claim column, this fails
    instead of the sweep silently comparing the boolean again."""
    for name, claims in DISTRIBUTION_PINNED_CLAIMS.items():
        sql = ENTRIES[name].oracle
        for col in claims:
            assert col in sql, (
                f"{name}: claim column {col!r} not in oracle SQL — "
                f"update DISTRIBUTION_PINNED_CLAIMS")
