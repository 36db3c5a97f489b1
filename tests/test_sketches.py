"""Sketch-family guarantees: freqItems superset, HLL accuracy + merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.olap import (
    distinct_parts_sketch_rollup,
    heavy_hitters,
    heavy_hitters_approx,
)
from retail_sales_project_bigdata_spark.sources import read_table
from tests.conftest import SF_SMALL


def test_freqitems_superset_of_exact(spark):
    exact = {r.l_partkey for r in heavy_hitters(spark, SF_SMALL).collect()}
    approx = {r.l_partkey for r in heavy_hitters_approx(spark, SF_SMALL).collect()}
    assert exact, "threshold dropped every part — test data drifted"
    assert exact <= approx  # KPS guarantee: no false negatives


def test_hll_rollup_accuracy_and_merge(spark):
    got = {
        r.l_returnflag: (r.nd_parts_est, r.n_rows)
        for r in distinct_parts_sketch_rollup(spark, SF_SMALL).collect()
    }
    li = read_table(spark, SF_SMALL, "lineitem")
    exact_all = li.select(F.countDistinct("l_partkey")).first()[0]
    n_all = li.count()
    est_all, rows_all = got["ALL"]
    assert rows_all == n_all  # counts merge exactly
    assert abs(est_all - exact_all) / exact_all < 0.05  # HLL lgK=12 ≈ 1.6% rse

    # merging the per-flag sketches must equal sketching the base table
    direct = li.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("l_partkey"))
    ).first()[0]
    assert est_all == direct

    per_flag_exact = {
        r.l_returnflag: r.nd
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("nd"))
        .collect()
    }
    for flag, nd in per_flag_exact.items():
        assert abs(got[flag][0] - nd) / nd < 0.05


def test_rolling_distinct_users_hll_tracks_exact(spark):
    """The mergeable-sketch twin must cover exactly the exact twin's day
    set and stay inside the sketch's published error envelope (~3x the
    relative standard error at lgK=13 ≈ 5%, with slack for union noise).
    At the test SF the sketch is in sparse mode, so the estimates are in
    fact exact — the bound is the contract, the equality is a bonus."""
    from retail_sales_project_bigdata_spark.operators.sessions import (
        rolling_distinct_users,
        rolling_distinct_users_hll,
    )

    exact = {
        r.day: (r.active_users_1d, r.active_users_7d)
        for r in rolling_distinct_users(spark, SF_SMALL).collect()
    }
    est = {
        r.day: (r.active_users_1d_est, r.active_users_7d_est)
        for r in rolling_distinct_users_hll(spark, SF_SMALL).collect()
    }
    assert set(exact) == set(est)
    assert exact, "no active days — test data drifted"
    for day, (e1, e7) in exact.items():
        g1, g7 = est[day]
        assert abs(g1 - e1) <= max(2.0, 0.05 * e1)
        assert abs(g7 - e7) <= max(2.0, 0.05 * e7)
