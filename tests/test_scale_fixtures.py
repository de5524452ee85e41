"""Property pins for the scale-soak fixture generator
(scripts/gen_scale_fixtures.py).  The sf1 soak's claims — "measures
scale, not a different dataset" and "near-dup density scales
LINEARLY" — rest on these invariants, so they are test-backed at
mult=2 over sf0.001 (pandas-only, no Spark session needed)."""
from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from scripts.gen_scale_fixtures import FIXED, KEYED, replicate  # noqa: E402

SRC = "/root/testdata/sf0.001"
MULT = 2


@pytest.fixture(scope="module")
def gen(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("scalefix"))
    replicate(MULT, out, SRC)
    return out


def _t(d, name):
    return pd.read_parquet(os.path.join(d, f"{name}.parquet"))


def test_row_counts_and_fixed_dims(gen):
    for t in KEYED:
        assert len(_t(gen, t)) == MULT * len(_t(SRC, t)), t
    for t in FIXED:
        assert _t(gen, t).equals(_t(SRC, t)), t


def test_referential_integrity_per_copy(gen):
    li, od, cu = _t(gen, "lineitem"), _t(gen, "orders"), _t(gen, "customer")
    assert li.l_orderkey.isin(set(od.o_orderkey)).all()
    assert od.o_custkey.isin(set(cu.c_custkey)).all()
    assert li.l_suppkey.isin(set(_t(gen, "supplier").s_suppkey)).all()
    assert li.l_partkey.isin(set(_t(gen, "part").p_partkey)).all()
    # primary keys stay unique after offsetting (strides don't collide)
    for t, pk in (("orders", "o_orderkey"), ("customer", "c_custkey"),
                  ("documents", "doc_id"), ("events", "event_id"),
                  ("embeddings", "vec_id")):
        assert _t(gen, t)[pk].is_unique, t


def test_distributions_scale_exactly(gen):
    """Value distributions are preserved exactly: every non-key column
    histogram is MULT x the source histogram."""
    src, out = _t(SRC, "documents"), _t(gen, "documents")
    for col in ("lang", "source"):
        assert (out[col].value_counts()
                == MULT * src[col].value_counts()).all(), col
    se, oe = _t(SRC, "events"), _t(gen, "events")
    assert (oe.event_type.value_counts()
            == MULT * se.event_type.value_counts()).all()
    # per-user event-count distribution unchanged (user offset, not fanout)
    assert (oe.groupby("user_id").size().value_counts()
            == MULT * se.groupby("user_id").size().value_counts()).all()


def test_document_token_bijection(gen):
    """Copy-k texts: token-set Jaccard structure preserved WITHIN a
    copy (suffixing every token is a bijection) and token sets
    DISJOINT across copies — the property that keeps LSH candidate
    pairs linear in MULT."""
    src, out = _t(SRC, "documents"), _t(gen, "documents")
    n = len(src)
    c0 = out.iloc[:n].reset_index(drop=True)
    c1 = out.iloc[n:].reset_index(drop=True)
    assert c0.text.equals(src.text)                     # copy 0 verbatim
    toks0 = c1.text.iloc[0].split(" ")
    assert all(t.endswith("~1") for t in toks0 if t)
    # bijection: same-position docs have identical token MULTISETS up
    # to the suffix, so within-copy equality structure is preserved
    strip = c1.text.str.replace("~1", "", regex=False)
    assert strip.equals(src.text)
    # disjoint across copies
    s0 = set(src.text.iloc[0].split(" "))
    s1 = set(c1.text.iloc[0].split(" "))
    assert not (s0 & s1)
    # n_chars invariant holds post-transform
    assert (out.n_chars == out.text.str.len()).all()
    # exact-dup multiplicity never exceeds the source's (no cross-copy
    # merging of duplicate groups)
    assert out.text.value_counts().max() == src.text.value_counts().max()


def test_embedding_roll_preserves_norms_and_decorrelates(gen):
    src, out = _t(SRC, "embeddings"), _t(gen, "embeddings")
    n = len(src)
    v_src = np.stack(src.embedding.to_numpy())
    v_c1 = np.stack(out.embedding.iloc[n:].to_numpy())
    assert np.allclose(np.linalg.norm(v_src, axis=1),
                       np.linalg.norm(v_c1, axis=1))
    assert np.allclose(np.roll(v_src, 1, axis=1), v_c1)
    assert (out.label.iloc[n:].to_numpy() == src.label.to_numpy()).all()


def test_deterministic_rerun_byte_identical(gen, tmp_path):
    out2 = str(tmp_path / "again")
    replicate(MULT, out2, SRC)
    for t in list(KEYED) + list(FIXED):
        a = open(os.path.join(gen, f"{t}.parquet"), "rb").read()
        b = open(os.path.join(out2, f"{t}.parquet"), "rb").read()
        assert a == b, t
