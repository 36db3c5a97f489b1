"""Round-3 additions: bucketed 2-D skyline, iterative k-core,
rolling z-score anomalies, ANN recall evaluation.

Each operator's sf0.01 value check lives in the oracle gate; these tests
pin the algorithmic invariants at sf0.001 plus brute-force equivalence
for the distributed skyline (the oracle's NOT-EXISTS is quadratic — the
bucketed rewrite must match it on adversarial tie patterns)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.graph import (
    KCORE_K,
    _support_edges,
    kcore_members,
)
from retail_sales_project_bigdata_spark.operators.reports import (
    pareto_suppliers,
    skyline_2d,
)
from retail_sales_project_bigdata_spark.operators.similarity import (
    TOP_K,
    ann_bruteforce_topk,
    ann_lsh_topk,
    ann_recall_eval,
)
from retail_sales_project_bigdata_spark.operators.stats import (
    ANOMALY_MIN_BASE,
    revenue_anomalies,
)
from tests.conftest import SF_SMALL


def _brute_skyline(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Quadratic reference: keep points not dominated (>= / <= with one
    strict edge).  Duplicates of a surviving point all survive."""
    out = []
    for i, (x, y) in enumerate(pts):
        dominated = any(
            tx >= x and ty <= y and (tx > x or ty < y)
            for j, (tx, ty) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def _run_skyline(spark, pts, n_buckets):
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        schema="id long, rev long, delay long",
    )
    got = skyline_2d(df, "rev", "delay", n_buckets=n_buckets).collect()
    return sorted((r.rev, r.delay) for r in got)


def test_skyline_matches_bruteforce_on_ties(spark):
    # dense small domain → many exact ties on both axes, duplicates,
    # and equal-rev runs that straddle would-be bucket boundaries
    rng = random.Random(7)
    pts = [(rng.randint(0, 9), rng.randint(0, 9)) for _ in range(120)]
    pts += [(5, 5), (5, 5), (9, 0), (9, 0)]  # duplicate frontier points
    for n_buckets in (1, 3, 8):
        assert _run_skyline(spark, pts, n_buckets) == _brute_skyline(pts)


def test_skyline_matches_bruteforce_random_wide(spark):
    rng = random.Random(13)
    pts = [(rng.randint(0, 10**6), rng.randint(0, 10**4)) for _ in range(300)]
    assert _run_skyline(spark, pts, 8) == _brute_skyline(pts)


def test_skyline_preserves_other_columns(spark):
    df = spark.createDataFrame(
        [(1, 10, 0, "a"), (2, 20, 9, "b"), (3, 20, 1, "c")],
        schema="id long, rev long, delay long, tag string",
    )
    got = skyline_2d(df, "rev", "delay", n_buckets=2).collect()
    assert sorted((r.id, r.tag) for r in got) == [(1, "a"), (3, "c")]
    assert set(got[0].asDict()) == {"id", "rev", "delay", "tag"}


def _python_kcore(edges: list[tuple[int, int]], k: int) -> dict[int, int]:
    """Reference peeling on the collected (symmetric, distinct) edges."""
    cur = set(edges)
    while True:
        deg: dict[int, int] = {}
        for s, _ in cur:
            deg[s] = deg.get(s, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        nxt = {(s, d) for s, d in cur if s in keep and d in keep}
        if nxt == cur:
            break
        cur = nxt
    out: dict[int, int] = {}
    for s, _ in cur:
        out[s] = out.get(s, 0) + 1
    return out


def test_kcore_matches_python_peeling(spark):
    edges = [
        (int(r.src), int(r.dst))
        for r in _support_edges(spark, SF_SMALL).collect()
    ]
    expected = _python_kcore(edges, KCORE_K)
    got = {
        int(r.node): int(r.core_degree)
        for r in kcore_members(spark, SF_SMALL).collect()
    }
    assert got == expected
    # invariant: every member meets the degree bound inside the core
    assert all(d >= KCORE_K for d in got.values()) or not got


def test_revenue_anomalies_flag_score_consistency(spark):
    rows = revenue_anomalies(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.n_base < ANOMALY_MIN_BASE:
            assert r.zscore is None and r.is_anomaly == 0
        if r.zscore is not None:
            # the flag is the EXACT integer comparison; the score is its
            # rounded float shadow — they agree away from the boundary
            if r.is_anomaly:
                assert abs(r.zscore) > 1.999
            else:
                assert abs(r.zscore) <= 2.000001
        elif r.n_base >= ANOMALY_MIN_BASE and r.is_anomaly:
            # zero-variance baseline, nonzero deviation: flagged, no score
            pass


def test_ann_recall_eval_counts_match_topk_frames(spark):
    exact = {
        (r.q_id, r.neighbor_id)
        for r in ann_bruteforce_topk(spark, SF_SMALL).collect()
    }
    approx = {
        (r.q_id, r.neighbor_id)
        for r in ann_lsh_topk(spark, SF_SMALL).collect()
    }
    rows = ann_recall_eval(spark, SF_SMALL).collect()
    assert {r.q_id for r in rows} == {q for q, _ in exact}
    for r in rows:
        assert r.n_exact == TOP_K
        inter = {
            (q, n) for q, n in exact if q == r.q_id
        } & approx
        assert r.n_hits == len(inter)
        assert 0.0 <= r.recall <= 1.0
        assert abs(r.recall - r.n_hits / r.n_exact) < 1e-9


def test_pareto_suppliers_no_dominated_rows(spark):
    rows = pareto_suppliers(spark, SF_SMALL).collect()
    assert rows
    pts = [(r.revenue_cents, r.max_delay_days) for r in rows]
    # the frontier is mutually non-dominating
    assert sorted(pts) == _brute_skyline(pts)
