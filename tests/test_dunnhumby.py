"""Reference-native cleaning semantics on inline fixtures (FIXTURES.md §C:
zero quantities, negative values, outlier caps, null fills, defensive
column resolution)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.dunnhumby import (
    clean_transactions,
)


def _raw(spark, rows):
    return spark.createDataFrame(
        rows,
        "household_key int, basket_id long, day int, `PRODUCT_ID_x` int,"
        " quantity int, `Sales Value` double, retail_disc double,"
        " coupon_disc double, campaign string",
    )


def test_clean_transactions_full_chain(spark):
    rows = [
        # normal discounted row: net = 10 - 1 - 0.5 = 8.5
        (1, 10, 5, 100, 2, 10.0, -1.0, -0.5, "TypeA"),
        # zero quantity → dropped (:73-74)
        (1, 10, 5, 101, 0, 10.0, 0.0, 0.0, None),
        # negative sales → dropped
        (1, 10, 5, 102, 1, -3.0, 0.0, 0.0, None),
        # outlier quantity → dropped (cap 1000)
        (1, 10, 5, 103, 2000, 10.0, 0.0, 0.0, None),
        # null fills: discs → 0.0, campaign → UNKNOWN → flag 0
        (2, 11, 9, 104, 1, 4.0, None, None, None),
    ]
    out = clean_transactions(_raw(spark, rows)).orderBy("product_id").collect()
    assert [r.product_id for r in out] == [100, 104]

    r0 = out[0]
    assert r0.net_sales == 8.5
    assert r0.unit_price == 5.0
    assert r0.discount_rate == 0.1  # -(-1.0)/10.0
    assert r0.is_discounted == 1
    assert r0.campaign_flag == 1
    assert r0.week_no == 1  # ceil(5/7)

    r1 = out[1]
    assert r1.retail_disc == 0.0 and r1.coupon_disc == 0.0
    assert r1.campaign == "UNKNOWN" and r1.campaign_flag == 0
    assert r1.is_discounted == 0
    assert r1.week_no == 2  # ceil(9/7)


def test_clean_transactions_column_standardization(spark):
    out = clean_transactions(_raw(spark, [(1, 10, 5, 100, 2, 10.0, 0.0, 0.0, None)]))
    # "Sales Value" → sales_value; PRODUCT_ID_x resolved → product_id
    assert "sales_value" in out.columns
    assert "product_id" in out.columns
    assert "PRODUCT_ID_x" not in out.columns


def test_safe_division_rows_survive(spark):
    # sales_value == 0 row: discount_rate guard returns 0, no null/inf
    rows = [(1, 10, 5, 100, 2, 0.0, 0.0, 0.0, None)]
    r = clean_transactions(_raw(spark, rows)).first()
    assert r.unit_price == 0.0 and r.discount_rate == 0.0
