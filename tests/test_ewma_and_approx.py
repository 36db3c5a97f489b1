"""Property tests: grouped-map EWMA vs local pandas; HLL sketch accuracy."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.segmentation import (
    segmentation_features,
    segmentation_features_approx,
)
from retail_sales_project_bigdata_spark.operators.sessions import user_value_ewma
from retail_sales_project_bigdata_spark.sources import read_events
from tests.conftest import SF_SMALL


def test_ewma_matches_local_pandas(spark):
    got = user_value_ewma(spark, SF_SMALL).toPandas()
    raw = read_events(spark, SF_SMALL).select(
        "event_id", "user_id", "ts_us", "value"
    ).toPandas()

    expected = {}
    for uid, grp in raw.sort_values(["ts_us", "event_id"]).groupby("user_id"):
        vals = grp["value"].ewm(alpha=0.3, adjust=False).mean().round(6)
        for eid, v in zip(grp["event_id"], vals):
            expected[eid] = v
    assert len(got) == len(raw)
    for eid, v in zip(got["event_id"], got["ewma_value"]):
        assert abs(expected[eid] - v) < 1e-9, eid


def test_approx_count_distinct_within_tolerance(spark):
    exact = {
        r.custkey: (r.n_baskets, r.n_products)
        for r in segmentation_features(spark, SF_SMALL).collect()
    }
    approx = {
        r.custkey: (r.n_baskets_approx, r.n_products_approx)
        for r in segmentation_features_approx(spark, SF_SMALL).collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        for e, a in zip(exact[k], approx[k]):
            assert abs(a - e) <= max(2, 0.1 * e), (k, e, a)


def test_weekly_demand_fast_matches_exact_within_tolerance(spark):
    """The throughput twin must agree with the oracle-exact weekly_demand
    up to float summation order (VERDICT r1 item 8)."""
    import math

    from retail_sales_project_bigdata_spark.operators.temporal import (
        weekly_demand,
        weekly_demand_fast,
    )
    from tests.conftest import SF_SMALL

    exact = {
        (r.store_id, r.product_id, r.week_no): r
        for r in weekly_demand(spark, SF_SMALL).collect()
    }
    fast = weekly_demand_fast(spark, SF_SMALL).collect()
    assert len(fast) == len(exact)
    for r in fast:
        e = exact[(r.store_id, r.product_id, r.week_no)]
        # the exact entry rounds to the oracle grids (sum: 4dp, avg: 6dp)
        assert math.isclose(r.sum_net_sales, e.sum_net_sales, abs_tol=5e-5)
        assert math.isclose(r.avg_unit_price, e.avg_unit_price, abs_tol=1e-6)
        assert r.any_discounted == e.any_discounted
