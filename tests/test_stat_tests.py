"""Statistical-test operators (MAD outliers, two-sample KS, χ²
independence, winsorized mean) + the new pipeline ops (normalized dedup,
token diversity, open-lines range aggregation): pure-Python references
and internal-consistency invariants.  Cross-engine value equality is the
oracle gate's job; these pin the MATH against independent numpy/pandas
computations at sf0.001.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from retail_sales_project_bigdata_spark.operators.dedup import (
    dedup_exact,
    normalized_dedup,
)
from retail_sales_project_bigdata_spark.operators.rangejoin import (
    MAX_FULFILL_DAYS,
    open_lines_by_week,
)
from retail_sales_project_bigdata_spark.operators.stats import (
    MAD_K,
    chi2_priority_region,
    ks_test_returnflag,
    price_outliers_mad,
    winsorized_price_stats,
)
from retail_sales_project_bigdata_spark.operators.textstats import (
    token_diversity_by_source,
)
from tests.conftest import SF_SMALL


def _lineitem_cents(flag: str) -> np.ndarray:
    df = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    sel = df[df.l_returnflag == flag]
    return np.round(sel.l_extendedprice * 100).astype(np.int64).to_numpy()


def test_mad_matches_numpy(spark):
    rows = {r.l_returnflag: r for r in price_outliers_mad(spark, SF_SMALL).collect()}
    for flag in ["A", "N", "R"]:
        p = _lineitem_cents(flag)
        med = np.percentile(p, 50)  # linear interpolation == quantile_cont
        mad = np.percentile(np.abs(p - med), 50)
        r = rows[flag]
        assert r.median_cents == med
        assert r.mad_cents == mad
        assert r.n == len(p)
        assert r.n_outliers == int(np.sum(np.abs(p - med) > MAD_K * mad))


def test_ks_matches_numpy(spark):
    r = ks_test_returnflag(spark, SF_SMALL).collect()[0]
    a, b = _lineitem_cents("R"), _lineitem_cents("N")
    assert (r.n_r, r.n_n) == (len(a), len(b))
    grid = np.union1d(a, b)
    ecdf_a = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    ecdf_b = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    d = float(np.max(np.abs(ecdf_a - ecdf_b)))
    assert abs(r.d_stat - d) < 1e-6
    crit = 1.358 * np.sqrt((len(a) + len(b)) / (len(a) * len(b)))
    assert abs(r.crit_05 - crit) < 1e-6
    assert r.reject_05 == int(d > crit)


def test_chi2_matches_pandas(spark):
    rows = chi2_priority_region(spark, SF_SMALL).collect()
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    c = pd.read_parquet(f"{SF_SMALL}/customer.parquet")
    n = pd.read_parquet(f"{SF_SMALL}/nation.parquet")
    rg = pd.read_parquet(f"{SF_SMALL}/region.parquet")
    j = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(rg, left_on="n_regionkey", right_on="r_regionkey")
    )
    ct = pd.crosstab(j.r_name, j.o_orderpriority)
    grand = ct.to_numpy().sum()
    chi2_total = 0.0
    for r in rows:
        obs = ct.loc[r.r_name, r.o_orderpriority]
        exp = ct.loc[r.r_name].sum() * ct[r.o_orderpriority].sum() / grand
        assert r.n_obs == obs
        assert abs(r.expected - exp) < 1e-5
        chi2_total += r.chi2_term
    # independence of the synthetic generator: the statistic is finite
    # and non-negative; every cell is present
    assert chi2_total >= 0.0
    assert len(rows) == ct.shape[0] * ct.shape[1]


def test_winsorized_matches_numpy(spark):
    rows = {
        r.l_returnflag: r
        for r in winsorized_price_stats(spark, SF_SMALL).collect()
    }
    for flag in ["A", "N", "R"]:
        p = _lineitem_cents(flag)
        lo, hi = np.percentile(p, 5), np.percentile(p, 95)
        wmean = float(np.mean(np.clip(p.astype(float), lo, hi)))
        r = rows[flag]
        assert abs(r.p05_cents - lo) < 1e-6
        assert abs(r.p95_cents - hi) < 1e-6
        assert abs(r.winsorized_mean_cents - wmean) < 1e-4
        assert r.n_lo == int(np.sum(p < lo)) and r.n_hi == int(np.sum(p > hi))


def test_normalized_dedup_refines_exact(spark):
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    norm_rows = normalized_dedup(spark, SF_SMALL).collect()
    exact_rows = dedup_exact(spark, SF_SMALL).collect()
    # total multiplicity is conserved and normalization can only merge
    assert sum(r.n_copies for r in norm_rows) == len(docs)
    assert len(norm_rows) <= len(exact_rows)
    for r in norm_rows:
        assert 1 <= r.n_raw_variants <= r.n_copies


def test_token_diversity_matches_pandas(spark):
    rows = token_diversity_by_source(spark, SF_SMALL).collect()
    docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
    by_source = {}
    for _, row in docs.iterrows():
        toks = row.text.lower().split(" ")
        by_source.setdefault(row.source, []).extend(toks)
    assert {r.source for r in rows} == set(by_source)
    for r in rows:
        counts = pd.Series(by_source[r.source]).value_counts()
        n = counts.sum()
        assert r.n_tokens == n and r.n_types == len(counts)
        simpson = 1.0 - float((counts.astype(float) ** 2).sum()) / float(n) ** 2
        assert abs(r.simpson_diversity - simpson) < 1e-6
        assert abs(r.top_token_share - counts.iloc[0] / n) < 1e-6
        assert 0.0 < r.simpson_diversity < 1.0


def test_open_lines_by_week_conserves_line_weeks(spark):
    rows = open_lines_by_week(spark, SF_SMALL).collect()
    li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
    o = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    lag = (j.l_shipdate.dt.normalize() - j.o_orderdate.dt.normalize()).dt.days
    kept = j[(lag > 0) & (lag <= MAX_FULFILL_DAYS)]
    klag = lag[(lag > 0) & (lag <= MAX_FULFILL_DAYS)]
    d0 = (
        kept.o_orderdate.dt.normalize() - pd.Timestamp("1995-01-01")
    ).dt.days
    n_line_weeks = int(((d0 + klag - 1) // 7 - d0 // 7 + 1).sum())
    assert sum(r.n_open_lines for r in rows) == n_line_weeks
    # every covered week index is within the data's date span
    max_week = int((d0 + klag - 1).max() // 7)
    for r in rows:
        assert 0 <= r.week_no <= max_week
