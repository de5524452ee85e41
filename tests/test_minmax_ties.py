"""Regression pin for the agg_minmax_by tie bug found at sf1 in the
r11 scale sweep: ``max_by(key, price)`` with tied prices lets each
engine legally return a different key, so the exhibit now uses an
order-preserving BIGINT encode (cents * 1e10 + key) that is (a)
deterministic under ties, (b) identical arithmetic on both engines,
and (c) still HASH-aggregatable (the struct-ordering fix was
deterministic too but demoted the plan to SortAggregate).

This test builds a fixture where EVERY group's extreme price is tied
across several orderkeys — the exact shape replicated fixtures
produce — and requires the Spark result to hash-match the DuckDB
oracle and to pick the contracted keys (largest key at max price,
smallest at min price)."""
from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest

from cdc_plg_spark import registry
from cdc_plg_spark.testing import check_query

registry.load_all()

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tied_sf(tmp_path_factory):
    """sf0.001 clone whose orders table carries deliberate price ties
    at both extremes of every priority group."""
    out = tmp_path_factory.mktemp("tiedsf")
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "orders.parquet":
            shutil.copy(os.path.join(SRC, f), out / f)
    o = pd.read_parquet(os.path.join(SRC, "orders.parquet"))
    rows = []
    for prio, g in o.groupby("o_orderpriority"):
        g = g.copy()
        top, bot = g["o_totalprice"].max(), g["o_totalprice"].min()
        # Tie 3 more orderkeys onto each extreme, straddling the
        # incumbent's key so the tie-break is actually exercised in
        # both directions.
        idx = list(g.index[:6])
        g.loc[idx[:3], "o_totalprice"] = top
        g.loc[idx[3:6], "o_totalprice"] = bot
        rows.append(g)
    pd.concat(rows).to_parquet(out / "orders.parquet", index=False)
    return str(out)


def test_minmax_by_deterministic_under_ties(spark, tied_sf):
    assert check_query(spark, "agg_minmax_by", tied_sf) == 5


def test_minmax_by_picks_contracted_keys(spark, tied_sf):
    got = (registry.get("agg_minmax_by").fn(spark, tied_sf)
           .toPandas().set_index("o_orderpriority"))
    o = pd.read_parquet(os.path.join(tied_sf, "orders.parquet"))
    for prio, g in o.groupby("o_orderpriority"):
        top, bot = g["o_totalprice"].max(), g["o_totalprice"].min()
        want_top = int(g.loc[g["o_totalprice"] == top, "o_orderkey"].max())
        want_bot = int(g.loc[g["o_totalprice"] == bot, "o_orderkey"].min())
        assert int(got.loc[prio, "top_order"]) == want_top, prio
        assert int(got.loc[prio, "bottom_order"]) == want_bot, prio
        # the ties are real: several keys share the extreme price
        assert (g["o_totalprice"] == top).sum() >= 3
        assert (g["o_totalprice"] == bot).sum() >= 3


# ---- property pin for the order-preserving encode ------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_ENC_MULT = 10_000_000_000
# enforced domain bounds (agg_minmax_by docstring, corrected r12 per
# ADVICE): cents <= 922,337,202 — i.e. price < ~$9.22M — keeps
# cents*1e10 + key inside int64 when key < 1e10; the operator now
# guards this per row with assert_true instead of only documenting it
_cents = st.integers(min_value=0, max_value=922_337_202)
_keys = st.integers(min_value=0, max_value=_ENC_MULT - 1)


def test_out_of_domain_price_fails_loudly(spark, tmp_path):
    """Beyond the encodable bound the operator must RAISE (matching
    DuckDB's overflow error), never silently wrap the BIGINT and
    return a wrong orderkey — the r11 ADVICE silent-corruption
    hazard, now guarded per row with assert_true."""
    out = tmp_path / "sf"
    out.mkdir()
    for f in os.listdir(SRC):
        if f.endswith(".parquet") and f != "orders.parquet":
            shutil.copy(os.path.join(SRC, f), out / f)
    o = pd.read_parquet(os.path.join(SRC, "orders.parquet"))
    o.loc[o.index[0], "o_totalprice"] = 10_000_000.0  # > ~$9.22M
    o.to_parquet(out / "orders.parquet", index=False)
    with pytest.raises(Exception, match="encodable domain"):
        registry.get("agg_minmax_by").fn(spark, str(out)).collect()


@settings(max_examples=500, deadline=None)
@given(_cents, _keys, _cents, _keys)
def test_encode_is_order_isomorphic(c1, k1, c2, k2):
    """cents*1e10 + key compares exactly like the lexicographic pair
    (cents, key) across the documented domain — the property the
    hash-aggregatable argmax/argmin rests on — and stays in int64."""
    e1, e2 = c1 * _ENC_MULT + k1, c2 * _ENC_MULT + k2
    assert e1 < (1 << 63) and e2 < (1 << 63)
    assert (e1 < e2) == ((c1, k1) < (c2, k2))
    assert (e1 == e2) == ((c1, k1) == (c2, k2))
    # decode round-trips the key
    assert e1 % _ENC_MULT == k1
