"""Mann-Kendall trend test + dataset card: pure-Python reference for the
statistic, internal-consistency invariants for the card."""

from __future__ import annotations

import math

from retail_sales_project_bigdata_spark.operators.datasetops import (
    dataset_card,
)
from retail_sales_project_bigdata_spark.operators.dedup import dedup_exact
from retail_sales_project_bigdata_spark.operators.stats import (
    trend_mann_kendall,
)
from tests.conftest import SF_SMALL


def _python_mk(series: list[int]) -> tuple[int, int, float | None]:
    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[int, int] = {}
    for x in series:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie_term
    z = None
    if var18 > 0:
        z = (s - (s > 0) + (s < 0)) / math.sqrt(var18 / 18.0)
    return s, var18, z


def test_mann_kendall_matches_python_reference(spark):
    # rebuild each nation's weekly series exactly as the operator does,
    # straight from its own persisted weekly frame definition
    rows = trend_mann_kendall(spark, SF_SMALL).collect()
    assert rows

    import duckdb

    con = duckdb.connect()
    weekly = con.execute(
        f"""
        WITH weekly AS (
          SELECT n.n_name,
                 CAST(CEIL((datediff('day', DATE '1995-01-01',
                            CAST(o.o_orderdate AS DATE)) + 1) / 7.0) AS INT)
                   AS week_no,
                 CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
                      AS BIGINT) AS rev
          FROM '{SF_SMALL}/orders.parquet' o
          JOIN '{SF_SMALL}/customer.parquet' c ON o.o_custkey = c.c_custkey
          JOIN '{SF_SMALL}/nation.parquet' n ON c.c_nationkey = n.n_nationkey
          GROUP BY 1, 2
        )
        SELECT n_name, week_no, rev FROM weekly ORDER BY n_name, week_no
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for n_name, _, rev in weekly:
        series.setdefault(n_name, []).append(int(rev))

    for r in rows:
        s, var18, z = _python_mk(series[r.n_name])
        assert r.s_stat == s
        assert r.var18 == var18
        assert r.n_weeks == len(series[r.n_name])
        if z is None:
            assert r.zscore is None
        else:
            assert abs(r.zscore - z) < 1e-6
            expected = (
                "increasing"
                if z > 1.96
                else "decreasing"
                if z < -1.96
                else "no_trend"
            )
            assert r.trend == expected


def test_dataset_card_rollup_consistency(spark):
    rows = {r.source: r for r in dataset_card(spark, SF_SMALL).collect()}
    assert "ALL" in rows
    srcs = [r for s, r in rows.items() if s != "ALL"]
    total = rows["ALL"]
    assert total.n_docs == sum(r.n_docs for r in srcs)
    assert total.n_dup_docs == sum(r.n_dup_docs for r in srcs)
    assert total.total_tokens == sum(r.total_tokens for r in srcs)
    assert total.total_chars == sum(r.total_chars for r in srcs)
    # language spread: ALL sees at least as many languages as any source
    assert total.n_langs >= max(r.n_langs for r in srcs)
    for r in rows.values():
        assert 0.0 <= r.share_en <= 1.0
        assert 0.0 <= r.dup_share <= 1.0

    # corpus-wide dup doc count must equal what dedup_exact implies
    dup_from_dedup = sum(
        r.n_copies
        for r in dedup_exact(spark, SF_SMALL).collect()
        if r.n_copies > 1
    )
    assert total.n_dup_docs == dup_from_dedup
