"""Local differential-test harness mirroring the driver's oracle gate.

The driver runs each registry query on Spark and its oracle SQL on
DuckDB over the same parquet, then compares row-count + schema +
order-insensitive value hash. This module reproduces that comparison
locally so operators are validated before the round gate runs.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd

from cdc_plg_spark.catalog import TABLES

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


def duckdb_conn(sf_dir: str = TEST_SF_DIR) -> duckdb.DuckDBPyConnection:
    """Fresh DuckDB connection with fixture tables registered as views."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v):
    """Canonical scalar/array form: numpy → python, arrays → tuples."""
    if isinstance(v, np.ndarray):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, np.generic):
        return v.item()
    return v


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sorted-column, µs-timestamp, row-sorted canonical form."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # unify list-likes (Spark arrays come back as ndarray, DuckDB as list)
            pdf[c] = s.map(_canon)
    if len(pdf) and len(pdf.columns):
        key = pdf.astype(str)
        order = np.lexsort([key[c].to_numpy() for c in reversed(list(key.columns))])
        pdf = pdf.iloc[order].reset_index(drop=True)
    return pdf


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                        name: str = "", float_rtol: float = 1e-6,
                        float_atol: float = 1e-6, exact: bool = True) -> None:
    """Compare like the driver does.

    ``exact=True`` (default) mirrors the driver's value hash: float cells
    must be bit-identical, because the CORRECTNESS gate hashes raw values
    and last-ulp drift fails it.  Pass ``exact=False`` only for local
    sanity checks where isclose(float_rtol/float_atol) is the intended
    contract (e.g. recall-style metrics never sent through the driver
    hash) — a query registered WITH an oracle should always use the
    default, or it can pass here and still fail at driver time.
    """
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: schema mismatch: spark={list(a.columns)} oracle={list(b.columns)}")
    assert len(a) == len(b), f"{name}: row count {len(a)} vs oracle {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if exact:
            # Driver-faithfulness gate (VERDICT r12 #2): the driver hashes
            # RAW values, so an int64 Spark column paired with a float64
            # oracle column (DuckDB widening integer SUM to HUGEINT →
            # pandas float64) hashes 5000 vs 5000.0 and reds the round even
            # though the float-tolerant branch below would pass.  Refuse
            # the pairing outright instead of normalizing it away.
            a_int = pd.api.types.is_integer_dtype(av)
            b_int = pd.api.types.is_integer_dtype(bv)
            a_flt = pd.api.types.is_float_dtype(av)
            b_flt = pd.api.types.is_float_dtype(bv)
            assert not (a_int and b_flt) and not (a_flt and b_int), (
                f"{name}: column {c!r}: integer-vs-float dtype kind mismatch "
                f"(spark={av.dtype}, oracle={bv.dtype}) — the driver's raw "
                f"value hash WILL fail on this. If the oracle is a DuckDB "
                f"integer SUM, CAST(SUM(...) AS BIGINT) it "
                f"(registry.py oracle-authoring discipline).")
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype(float).to_numpy()
            bv = bv.astype(float).to_numpy()
            ok = np.isclose(av, bv, rtol=float_rtol, atol=float_atol, equal_nan=True)
            assert ok.all(), (
                f"{name}: column {c!r}: {int((~ok).sum())} value mismatches, "
                f"first at row {int(np.argmax(~ok))}: {av[np.argmax(~ok)]} vs {bv[np.argmax(~ok)]}")
            if not exact:
                continue
            # Driver-hash twin: the CORRECTNESS harness hashes values, so a
            # cell that is merely *close* (last-ulp drift, -0.0 vs 0.0) still
            # fails at driver time.  Require exact equality + identical sign
            # bit (catches negative zero), tolerating NaN==NaN.
            bitsame = ((av == bv) & (np.signbit(av) == np.signbit(bv))) | (
                np.isnan(av) & np.isnan(bv))
            assert bitsame.all(), (
                f"{name}: column {c!r}: {int((~bitsame).sum())} cells differ under "
                f"driver-hash (exact) semantics; first at row "
                f"{int(np.argmax(~bitsame))}: {av[np.argmax(~bitsame)]!r} vs "
                f"{bv[np.argmax(~bitsame)]!r} (close but not bit-identical — "
                f"round/canonicalize in BOTH engines)")
        else:
            # integer columns may come back int64 vs Int64/float — compare as objects
            mism = av.astype(str) != bv.astype(str)
            assert not mism.any(), (
                f"{name}: column {c!r}: {int(mism.sum())} mismatches, first at row "
                f"{int(np.argmax(mism.to_numpy()))}: "
                f"{av[mism].iloc[0]!r} vs {bv[mism].iloc[0]!r}")


def check_query(spark, name: str, sf_dir: str = TEST_SF_DIR) -> int:
    """Run one registry query against its oracle; returns the row count."""
    from cdc_plg_spark import registry

    q = registry.get(name)
    spark_pdf = q.fn(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0
        return len(spark_pdf)
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(q.oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name=name)
    return len(spark_pdf)
