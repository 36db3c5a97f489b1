"""Learned quality filter (weak-label bootstrap): balance, AUC vs the
recoverable weak labels, determinism across refits."""

from __future__ import annotations

import numpy as np

from retail_sales_project_bigdata_spark.ml.pipelines import (
    quality_classifier_scores,
)
from tests.conftest import SF_SMALL


def test_quality_classifier_learns_weak_labels(spark):
    rows = quality_classifier_scores(spark, SF_SMALL).collect()
    lab = np.array([r.weak_label for r in rows])
    sc = np.array([r.quality_score for r in rows])

    # median split → both classes present and roughly balanced
    assert 0.3 <= lab.mean() <= 0.7
    assert all(0.0 <= s <= 1.0 for s in sc)

    pos, neg = sc[lab == 1], sc[lab == 0]
    auc = float(np.mean([(p > n) + 0.5 * (p == n) for p in pos for n in neg]))
    assert auc > 0.9  # hashed unigrams recover the stopword heuristic

    # keep flag is the 0.5 threshold on the score
    for r in rows:
        assert r.keep == int(r.quality_score > 0.5)


def test_quality_classifier_deterministic_refit(spark):
    a = sorted(map(tuple, quality_classifier_scores(spark, SF_SMALL).collect()))
    b = sorted(map(tuple, quality_classifier_scores(spark, SF_SMALL).collect()))
    assert a == b


def test_scores_after_session_observation(spark):
    """Regression: scoring must survive a session that has used
    ``df.observe``.  Spark 4.1's SparkSession.observationManager is
    created lazily and is NOT serializable; an LR model's trainingSummary
    references the session, so ``model.transform`` blew up with
    ``NotSerializableException: ObservationManager`` whenever any
    Observation ran earlier in the session (order-dependent — the full
    suite runs observe-based tests first).  Fixed by
    ``ml.pipelines.strip_training_summary`` after every fit."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    spark.range(5).observe(obs, F.count(F.lit(1)).alias("n")).collect()
    assert obs.get["n"] == 5  # observationManager is now materialized

    rows = quality_classifier_scores(spark, SF_SMALL).limit(5).collect()
    assert rows
