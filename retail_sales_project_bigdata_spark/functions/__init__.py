"""Scalar/aggregate function surface (SURVEY §2.8) + oracle-stable helpers.

The reference's scalar surface is arithmetic, ``when/otherwise``,
``coalesce``, ``ceil``, null fills and integer day/week math
(``FullPreprocessingPipeline.java:77-161``, ``ChurnPrediction.java:132``).
Everything here is a composition of built-in ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen'd; no Python UDFs.

Float determinism: Spark's partial aggregation order varies run-to-run, so a
raw ``sum(double)`` can wobble in final ulps.  The inputs are "really"
2-decimal money values though, so the true sums sit exactly on 2-decimal
points — derived ``net_sales`` on a 4-decimal grid — rounding the sum AT the grid
scale (4) recovers the exact value on both engines: the true sum is never
at a scale-4 rounding boundary (that would need 5 decimals) and FP noise
(~1e-9 at 60k rows) is far below the 5e-5 gap.  Rounding BELOW the grid
scale (e.g. 2) would hit exact ``.xx5`` ties where engine sum order picks
the side — never do that.
Ties round half-away-from-zero in both Spark (``HALF_UP``) and DuckDB
(``std::round``), so rounding identical doubles always agrees.  Decimal
casts of *derived ratios* are deliberately avoided: Spark casts
double→decimal via the shortest string representation (half-up) while
DuckDB scales the binary value — they disagree on values like 2194.47125.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Epoch for integer-day derivation over the testdata (orders start 1995-01-01;
# day 1 == 1995-01-01, matching the reference's 1-based `day` column).
DAY_EPOCH = "1995-01-01"

def stable_sum(col: Column | str, scale: int = 4) -> Column:
    """Engine-portable sum of a double column (rounded to ``scale``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c), scale)


def stable_avg(col: Column | str, scale: int = 6) -> Column:
    """Engine-portable average: explicit sum/count (identical expression on
    the DuckDB side — avoids engine-specific AVG implementations)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c) / F.count(c), scale)


def oracle_sum(expr: str, scale: int = 4) -> str:
    """DuckDB SQL mirroring :func:`stable_sum` exactly."""
    return f"ROUND(SUM({expr}), {scale})"


def oracle_avg(expr: str, scale: int = 6) -> str:
    """DuckDB SQL mirroring :func:`stable_avg` exactly."""
    return f"ROUND(SUM({expr}) / COUNT({expr}), {scale})"


def day_index(ts_col: Column | str, epoch: str = DAY_EPOCH) -> Column:
    """1-based integer day index from a timestamp column.

    Parity with the reference's integer ``day`` column (FIXTURES.md §B maps
    ``transaction_data.DAY`` → ``o_orderdate``/``l_shipdate`` via datediff).
    """
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (F.datediff(c.cast("date"), F.lit(epoch).cast("date")) + 1).cast("int")


def week_no(day_col: Column | str) -> Column:
    """``week_no = ceil(day / 7)`` — FullPreprocessingPipeline.java:157-162.

    Integer-division safe: computed over a double so day=7 → week 1,
    day=8 → week 2 (DuckDB oracle: ``CAST(CEIL(day / 7.0) AS INT)``).
    """
    c = F.col(day_col) if isinstance(day_col, str) else day_col
    return F.ceil(c / F.lit(7.0)).cast("int")


def day_of_week(day_col: Column | str) -> Column:
    """``((day - 1) % 7) + 1`` — ChurnPrediction.java:132."""
    c = F.col(day_col) if isinstance(day_col, str) else day_col
    return (((c - 1) % 7) + 1).cast("int")


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """Division guarded by ``when`` — FullPreprocessingPipeline.java:85-100.

    The reference computes ``unit_price = sales/qty`` and
    ``discount_rate = disc/sales`` with when-guards against zero denominators.
    """
    return F.when(den != 0, num / den).otherwise(F.lit(default))


def net_sales(price: Column | str = "l_extendedprice",
              discount: Column | str = "l_discount") -> Column:
    """Revenue net of discount — the testdata analog of the reference's
    ``net_sales = sales_value + retail_disc + coupon_disc``
    (FullPreprocessingPipeline.java:77-83; discounts are ≤0 there, a
    multiplicative discount here)."""
    p = F.col(price) if isinstance(price, str) else price
    d = F.col(discount) if isinstance(discount, str) else discount
    return p * (F.lit(1.0) - d)
