"""Property-based checks (hypothesis) for the numeric fast paths that
the oracle-parity gate depends on: fast_round must agree with F.round
everywhere it's substituted, and the exact-cents sum must equal exact
decimal arithmetic. These run the expressions through a real Spark
session in batches (one Spark job per property run, not per example).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_plg_spark.functions.numeric import fast_round
from cdc_plg_spark.operators.aggregates import _exact_sum

# money-like doubles: up to 1e9 magnitude, 2-4 decimal digits
monies = st.decimals(min_value=Decimal("-1e9"), max_value=Decimal("1e9"),
                     places=2, allow_nan=False, allow_infinity=False)


@settings(max_examples=20, deadline=None)
@given(st.lists(monies, min_size=1, max_size=50), st.integers(0, 4))
def test_fast_round_matches_f_round(spark, values, scale):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    out = df.select(
        fast_round("x", scale).alias("fast"),
        F.round("x", scale).alias("ref")).collect()
    for r in out:
        assert r["fast"] == r["ref"], (r, scale)


@settings(max_examples=15, deadline=None)
@given(st.lists(monies, min_size=1, max_size=100))
def test_exact_sum_equals_decimal_arithmetic(spark, values):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    got = df.agg(_exact_sum("x").alias("s")).collect()[0]["s"]
    want = float(sum(v.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
                     for v in values))
    assert got == want, (got, want)


def test_fast_round_null_and_nan(spark):
    df = spark.createDataFrame(
        [(None,), (float("nan",),)], "x double")
    out = df.select(fast_round("x", 2).alias("r")).collect()
    assert out[0]["r"] is None
    assert out[1]["r"] != out[1]["r"]  # NaN propagates


@settings(max_examples=15, deadline=None)
@given(st.lists(st.floats(min_value=0.01, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=60))
def test_ewma_fold_matches_reference_recursion(spark, values):
    """The ts_ewma JVM fold must equal the textbook recursion
    y_i = α·x_i + (1-α)·y_{i-1} seeded with x_0 — same operation
    order, so equality is exact (both are IEEE double chains)."""
    from cdc_plg_spark.operators.timeseries import EWMA_ALPHA
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(list(values),)], "vals array<double>")
    fold = F.aggregate(
        F.slice("vals", 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at("vals", 1),
        lambda acc, x: EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc)
    got = df.select(fold.alias("e")).collect()[0]["e"]

    ref = values[0]
    for x in values[1:]:
        ref = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * ref
    assert got == ref, (got, ref)
