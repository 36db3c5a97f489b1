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


def test_combined_csv_multipart_and_probe_order(spark):
    """VERDICT r5 item 6 (e2e half): the combined-CSV fixture really is
    multi-part with merge-artifact headers, the read-back survives
    inference, and the probe picks product_id_x over the offset _y."""
    import glob
    import os

    from tests.conftest import SF_SMALL

    from retail_sales_project_bigdata_spark.operators.dunnhumby import (
        _CSV_FIXTURE_ROOT,
        dunnhumby_combined_csv,
    )

    out = dunnhumby_combined_csv(spark, SF_SMALL)
    path = os.path.join(
        _CSV_FIXTURE_ROOT, os.path.basename(SF_SMALL.rstrip("/")), "combined_csv"
    )
    parts = glob.glob(os.path.join(path, "part-*.csv"))
    assert len(parts) >= 2, "fixture must be a MULTI-part CSV"
    with open(parts[0]) as fh:
        header = fh.readline().strip()
    assert "Product_ID_x" in header and "Product_ID_y" in header
    assert "Trans Time" in header  # spaced header exercised

    # probe order, row-level: after cleaning, product_id carries the _x
    # values and the untouched product_id_y column still carries x+1 —
    # so every row must satisfy product_id_y == product_id + 1.  Had the
    # probe picked _y, product_id would EQUAL product_id_y and this
    # count would be the full table.
    from retail_sales_project_bigdata_spark.operators.dunnhumby import (
        clean_transactions,
    )
    from retail_sales_project_bigdata_spark.sources import read_csv

    cleaned = clean_transactions(read_csv(spark, path, infer=True))
    assert "product_id_y" in cleaned.columns
    wrong = cleaned.filter(
        F.col("product_id_y") != F.col("product_id") + 1
    ).count()
    assert wrong == 0
    assert out.count() > 0


def test_combined_csv_transactions_leg(spark):
    """The fan-out's FPM leg on the combined shape: distinct
    (basket_id, product_id), both non-null — mirrors
    FullPreprocessingPipeline.java:146-152."""
    from tests.conftest import SF_SMALL

    from retail_sales_project_bigdata_spark.operators.dunnhumby import (
        _CSV_FIXTURE_ROOT,
        clean_transactions,
    )
    import os

    from retail_sales_project_bigdata_spark.sources import read_csv

    path = os.path.join(
        _CSV_FIXTURE_ROOT, os.path.basename(SF_SMALL.rstrip("/")), "combined_csv"
    )
    if not os.path.isdir(path):  # fixture written by the query above
        from retail_sales_project_bigdata_spark.operators.dunnhumby import (
            dunnhumby_combined_csv,
        )

        dunnhumby_combined_csv(spark, SF_SMALL).count()
    cleaned = clean_transactions(read_csv(spark, path, infer=True))
    tx = (
        cleaned.select("basket_id", "product_id")
        .filter(F.col("basket_id").isNotNull())
        .filter(F.col("product_id").isNotNull())
        .dropDuplicates()
    )
    n = tx.count()
    assert n > 0
    assert n == tx.select("basket_id", "product_id").distinct().count()
