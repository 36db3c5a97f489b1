"""Property-based tests (hypothesis) for the scalar function surface —
randomized inputs against Python-reference semantics."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import (
    day_of_week,
    safe_div,
    stable_sum,
    week_no,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(days=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=20))
@_slow
def test_week_no_matches_python_ceil(spark, days):
    df = spark.createDataFrame([(d,) for d in days], ["day"])
    rows = df.select("day", week_no("day").alias("w")).collect()
    for r in rows:
        assert r.w == math.ceil(r.day / 7)


@given(days=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=20))
@_slow
def test_day_of_week_range_and_period(spark, days):
    df = spark.createDataFrame([(d,) for d in days], ["day"])
    for r in df.select("day", day_of_week("day").alias("w")).collect():
        assert 1 <= r.w <= 7
        assert r.w == ((r.day - 1) % 7) + 1


@given(
    pairs=st.lists(
        st.tuples(
            st.floats(-1e6, 1e6, allow_nan=False),
            st.floats(-1e6, 1e6, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
    )
)
@_slow
def test_safe_div_matches_python_division(spark, pairs):
    """Zero denominators give the default; everything else is plain IEEE
    division (bit-equal to Python's) — including overflow to inf for
    denormal denominators, which mirrors the reference's zero-only guard
    (FullPreprocessingPipeline.java:85-100)."""
    df = spark.createDataFrame(pairs, ["n", "d"])
    rows = df.select(
        "n", "d", safe_div(F.col("n"), F.col("d")).alias("q")
    ).collect()
    for r in rows:
        assert r.q is not None
        if r.d == 0:
            assert r.q == 0.0
        else:
            expected = r.n / r.d
            assert r.q == expected or (
                math.isnan(expected) and math.isnan(r.q)
            )


@given(
    vals=st.lists(
        st.integers(min_value=-10**6, max_value=10**6).map(lambda c: c / 100.0),
        min_size=1,
        max_size=30,
    )
)
@_slow
def test_stable_sum_equals_exact_decimal_sum(spark, vals):
    """For 2-decimal-grid inputs, stable_sum must recover the exact
    decimal total regardless of partitioning (the invariant the whole
    oracle gate rests on)."""
    from decimal import Decimal

    exact = float(sum(Decimal(f"{v:.2f}") for v in vals))
    for parts in (1, 4):
        df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(parts)
        got = df.agg(stable_sum("x", 2).alias("s")).first().s
        assert got == round(exact, 2)
