"""Item-item cosine neighbors: pandas reference + top-k contract."""

from __future__ import annotations

import itertools
import math

import pandas as pd

from retail_sales_project_bigdata_spark.operators.recommend import (
    II_MIN_CO,
    II_TOP_K,
    item_item_cosine_topk,
)
from tests.conftest import SF_SMALL


def _reference(sf_dir: str) -> dict[tuple[int, int], float]:
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    n = li.groupby("l_partkey").size().to_dict()
    co: dict[tuple[int, int], int] = {}
    for _, basket in li.groupby("l_orderkey"):
        for x, y in itertools.combinations(sorted(basket.l_partkey), 2):
            co[(x, y)] = co.get((x, y), 0) + 1
    return {
        (x, y): c / math.sqrt(n[x] * n[y])
        for (x, y), c in co.items()
        if c >= II_MIN_CO
    }


def test_item_item_matches_pandas(spark):
    rows = item_item_cosine_topk(spark, SF_SMALL).collect()
    ref = _reference(SF_SMALL)
    assert rows, "threshold too high for test data"
    for r in rows:
        key = (min(r.item, r.neighbor), max(r.item, r.neighbor))
        assert key in ref
        assert abs(r.cosine - ref[key]) < 1e-6
        assert 1 <= r.rank <= II_TOP_K
    # per item: ranks are 1..k contiguous and cosine non-increasing
    by_item: dict[int, list] = {}
    for r in rows:
        by_item.setdefault(r.item, []).append(r)
    for item, rs in by_item.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert a.cosine >= b.cosine
