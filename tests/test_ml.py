"""Property checks for ML-backed operators (SURVEY §5.2 strategy — never
hash-compare model outputs; assert structural/metric properties instead)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.ml.pipelines import churn_model_metrics
from retail_sales_project_bigdata_spark.operators.baskets import (
    MIN_SUPPORT,
    fpgrowth_itemsets,
    itemset_support_1,
)
from retail_sales_project_bigdata_spark.operators.recommend import (
    ALS_TOP_K,
    als_recommendations,
)
from retail_sales_project_bigdata_spark.operators.segmentation import (
    kmeans_sweep,
    segment_assignments,
)
from tests.conftest import SF_SMALL


def test_als_topk_per_user_descending(spark):
    recs = als_recommendations(spark, SF_SMALL)
    per_user = recs.groupBy("custkey").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.max("score")
            == F.first("score")  # noqa: E712 - first after sort below
        ).alias("_unused"),
    )
    assert per_user.filter(F.col("n") > ALS_TOP_K).count() == 0
    # scores strictly ordered within user when collected sorted
    rows = recs.orderBy("custkey", F.desc("score")).collect()
    by_user: dict[int, list[float]] = {}
    for r in rows:
        by_user.setdefault(r.custkey, []).append(r.score)
    assert all(scores == sorted(scores, reverse=True) for scores in by_user.values())


def test_fpgrowth_matches_relational_1itemsets(spark):
    """FP-Growth's size-1 itemsets must equal the a-priori relational count
    (exact cross-check, SURVEY §5.2)."""
    fp = {
        (r.itemset, r.freq)
        for r in fpgrowth_itemsets(spark, SF_SMALL)
        .filter(F.col("n_items") == 1)
        .collect()
    }
    rel = {
        (str(r.l_partkey), r.freq) for r in itemset_support_1(spark, SF_SMALL).collect()
    }
    assert fp == rel


def test_kmeans_sweep_shape(spark):
    rows = kmeans_sweep(spark, SF_SMALL).collect()
    assert [r.k for r in rows] == list(range(2, 9))
    assert all(-1.0 <= r.silhouette <= 1.0 for r in rows)
    assert all(r.wssse >= 0 for r in rows)
    assert sum(r.is_best for r in rows) == 1
    best = next(r for r in rows if r.is_best)
    assert best.silhouette == max(r.silhouette for r in rows)


def test_segment_assignments_cover_all_customers(spark):
    seg = segment_assignments(spark, SF_SMALL)
    assert seg.count() == 150  # every customer with purchases at sf0.001
    assert seg.select("cluster").distinct().count() >= 2


def test_churn_model_metrics(spark):
    row = churn_model_metrics(spark, SF_SMALL).first()
    assert 0.0 <= row.auc <= 1.0
    assert row.n_pairs > 0
    assert 0 <= row.n_positive <= row.n_pairs


def test_churn_cv_tuning_selects_from_grid(spark):
    """3-fold CV over the 2x2 RF grid must produce a finite mean AUC per
    grid point and select the best one."""
    from retail_sales_project_bigdata_spark.ml.pipelines import (
        CV_DEPTH_GRID,
        CV_TREES_GRID,
        tune_churn_cv,
    )
    from retail_sales_project_bigdata_spark.operators.churn import (
        churn_features,
    )

    cv_model, results = tune_churn_cv(churn_features(spark, SF_SMALL))
    assert len(results) == len(CV_DEPTH_GRID) * len(CV_TREES_GRID)
    assert all(0.0 <= r["mean_auc"] <= 1.0 for r in results)
    best = max(results, key=lambda r: r["mean_auc"])
    rf_model = cv_model.bestModel.stages[-1]
    assert rf_model.getMaxDepth() == best["maxDepth"]
    assert rf_model.getNumTrees == best["numTrees"]
