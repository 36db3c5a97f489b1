"""Distributed model-eval ops: AUC against a scipy-free rank reference,
calibration-table invariants."""

from __future__ import annotations

import numpy as np
import pandas as pd

from retail_sales_project_bigdata_spark.operators.modeleval import (
    CALIBRATION_TILES,
    _scored_labels,
    quality_score_auc,
    quality_score_calibration,
)
from tests.conftest import SF_SMALL


def _auc_reference(scores: np.ndarray, labels: np.ndarray) -> float:
    """Tie-corrected Mann-Whitney AUC via average ranks (the textbook
    formula, computed independently of the operator's prefix-sum
    decomposition)."""
    order = np.argsort(scores, kind="stable")
    s = scores[order]
    ranks = np.empty(len(s), dtype=float)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + 1 + j) / 2.0  # average of ranks i+1..j
        i = j
    lab = labels[order]
    n_pos = int(lab.sum())
    n_neg = len(lab) - n_pos
    r_pos = float(ranks[lab == 1].sum())
    return (r_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def test_auc_matches_rank_reference(spark):
    sl = _scored_labels(spark, SF_SMALL).toPandas()
    r = quality_score_auc(spark, SF_SMALL).collect()[0]
    assert r.n_pos == int(sl.label.sum())
    assert r.n_neg == len(sl) - r.n_pos
    ref = _auc_reference(sl.score.to_numpy(), sl.label.to_numpy())
    assert abs(r.auc - ref) < 1e-6
    assert abs(r.gini - (2 * ref - 1)) < 1e-6
    assert 0.0 <= r.auc <= 1.0


def test_calibration_partitions_corpus(spark):
    rows = quality_score_calibration(spark, SF_SMALL).collect()
    sl = _scored_labels(spark, SF_SMALL).toPandas()
    assert len(rows) == CALIBRATION_TILES
    assert sum(r.n_docs for r in rows) == len(sl)
    assert sum(r.n_pos for r in rows) == int(sl.label.sum())
    by_decile = sorted(rows, key=lambda r: r.decile)
    # NTILE balance: sizes differ by at most one
    sizes = [r.n_docs for r in by_decile]
    assert max(sizes) - min(sizes) <= 1
    # score bands are non-decreasing across deciles
    for a, b in zip(by_decile, by_decile[1:]):
        assert a.min_score <= a.max_score
        assert a.max_score <= b.min_score
    for r in rows:
        assert abs(r.pos_rate - r.n_pos / r.n_docs) < 1e-6
