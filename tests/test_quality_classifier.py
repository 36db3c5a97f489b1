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
