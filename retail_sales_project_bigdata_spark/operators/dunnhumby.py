"""Dunnhumby-native cleaning semantics (SURVEY §2.2 on the reference's OWN
schema) — the exact column logic of ``FullPreprocessingPipeline.java``,
runnable against real Dunnhumby CSVs.

The testdata-mapped operators (cleaning.py etc.) cover the oracle gate;
this module preserves reference-native behavior for users bringing the
original dataset:

- standardize names (``:52-55``), numeric/categorical fills (``:58-70``),
- positivity filters (``:73-74``), outlier caps (``:28-31``, ``:116-118``),
- ``net_sales = sales_value + retail_disc + coupon_disc [+ coupon_match]``
  (discount columns are ≤ 0 in Dunnhumby, ``:77-83``),
- guarded ``unit_price`` / ``discount_rate`` (``:85-100``),
- ``is_discounted`` when retail_disc < 0 (``:121-127``),
- ``campaign_flag`` when a campaign value is present (``:129-134``),
- ``week_no = ceil(day / 7)`` when absent (``:157-162``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import safe_div, week_no
from retail_sales_project_bigdata_spark.operators.colutils import (
    fill_categorical,
    fill_numeric,
    resolve_column,
    standardize_columns,
)

# FullPreprocessingPipeline.java:28-31
QUANTITY_CAP = 1000
SALES_CAP = 1000.0
DISC_CAP = 100.0

NUMERIC_FILL_COLS = [
    "sales_value",
    "quantity",
    "retail_disc",
    "coupon_disc",
    "coupon_match_disc",
]  # :58-60
CATEGORICAL_FILL_COLS = [
    "manufacturer",
    "department",
    "brand",
    "commodity_desc",
    "sub_commodity_desc",
    "display",
    "mailer",
    "coupon_upc",
    "campaign",
    "description",
    "description_cd",
    "age_desc",
    "marital_status_code",
    "income_desc",
    "homeowner_desc",
    "hh_comp_desc",
    "household_size_desc",
    "kid_category_desc",
]  # :62-70


def clean_transactions(raw: DataFrame) -> DataFrame:
    """The full transform chain on a Dunnhumby-shaped frame."""
    df = standardize_columns(raw)

    # defensive product_id resolution (:137-145)
    pid = resolve_column(df, "product_id", "product_id_x", "product_id_y")
    if pid is not None and pid != "product_id":
        df = df.withColumnRenamed(pid, "product_id")

    df = fill_numeric(df, NUMERIC_FILL_COLS, 0.0)
    df = fill_categorical(df, CATEGORICAL_FILL_COLS, "UNKNOWN")

    # positivity + outlier caps (:73-74, :116-118)
    df = df.filter(
        (F.col("quantity") > 0)
        & (F.col("quantity") <= QUANTITY_CAP)
        & (F.col("sales_value") >= 0)
        & (F.col("sales_value") <= SALES_CAP)
        & (F.col("retail_disc").between(-DISC_CAP, DISC_CAP))
    )

    # derived measures (:77-100); discounts are ≤ 0 in Dunnhumby
    net = (
        F.col("sales_value")
        + F.col("retail_disc")
        + F.col("coupon_disc")
        + (
            F.col("coupon_match_disc")
            if "coupon_match_disc" in df.columns
            else F.lit(0.0)
        )
    )
    df = (
        df.withColumn("net_sales", net)
        .withColumn(
            "unit_price", safe_div(F.col("sales_value"), F.col("quantity"))
        )
        .withColumn(
            "discount_rate",
            safe_div(-F.col("retail_disc"), F.col("sales_value")),
        )
        .withColumn(
            "is_discounted",
            F.when(F.col("retail_disc") < 0, 1).otherwise(0),
        )
    )
    if "campaign" in df.columns:
        df = df.withColumn(
            "campaign_flag",
            # campaign arrives as VARCHAR from inferred CSVs but as INT
            # from the declared COUPON_REDEMPT schema; compare through a
            # string cast so the UNKNOWN sentinel check cannot throw
            # CAST_INVALID_INPUT under ANSI mode on the numeric form.
            F.when(
                F.col("campaign").isNotNull()
                & (F.col("campaign").cast("string") != "UNKNOWN"),
                1,
            ).otherwise(0),
        )
    if "week_no" not in df.columns and "day" in df.columns:
        df = df.withColumn("week_no", week_no("day"))  # :157-162
    return df
