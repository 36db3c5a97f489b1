"""Semantic tests for the as-of join operator and the CDC primitives.

The oracle gate already value-hash-checks these against DuckDB (native
ASOF JOIN for the as-of query — an independent implementation of the
semantic).  Here: a third independent check via pandas ``merge_asof``,
and closed-form membership invariants for the simulated CDC snapshots.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.asof import (
    asof_view_before_purchase,
)
from retail_sales_project_bigdata_spark.operators.cdc import (
    merge_upsert,
    snapshot_diff,
)
from retail_sales_project_bigdata_spark.sources import read_events, read_table
from tests.conftest import SF_SMALL


def test_asof_matches_pandas_merge_asof(spark):
    got = (
        asof_view_before_purchase(spark, SF_SMALL)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ev = read_events(spark, SF_SMALL).select(
        "event_id", "user_id", "ts_us", "event_type", "value"
    ).toPandas()
    purchases = (
        ev[ev.event_type == "purchase"]
        .rename(columns={"value": "purchase_value"})
        .drop(columns="event_type")
        .sort_values("ts_us")
    )
    views = (
        ev[ev.event_type == "view"]
        .sort_values("event_id")
        .groupby(["user_id", "ts_us"], as_index=False)
        .last()
        .rename(
            columns={
                "event_id": "view_event_id",
                "ts_us": "view_ts_us",
                "value": "view_value",
            }
        )
        .drop(columns="event_type")
        .sort_values("view_ts_us")
    )
    expected = pd.merge_asof(
        purchases,
        views,
        left_on="ts_us",
        right_on="view_ts_us",
        by="user_id",
        direction="backward",
    )
    expected["view_event_id"] = expected["view_event_id"].fillna(-1).astype("int64")
    expected["view_ts_us"] = expected["view_ts_us"].fillna(-1).astype("int64")
    expected["view_value"] = expected["view_value"].fillna(-1.0)
    expected["gap_us"] = (expected["ts_us"] - expected["view_ts_us"]).where(
        expected["view_ts_us"] >= 0, -1
    )
    expected = expected.sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(expected)
    for col in ["event_id", "user_id", "ts_us", "view_event_id", "view_ts_us", "gap_us"]:
        assert got[col].tolist() == expected[col].tolist(), col
    assert (got["view_value"] - expected["view_value"]).abs().max() == 0.0


def test_snapshot_diff_membership_is_closed_form(spark):
    rows = {r.o_orderkey: r.status for r in snapshot_diff(spark, SF_SMALL).collect()}
    keys = [
        r.o_orderkey
        for r in read_table(spark, SF_SMALL, "orders").select("o_orderkey").collect()
    ]
    for k in keys:
        if k % 10 == 0:
            # dropped from the old snapshot -> reappears as added
            assert rows.get(k) == "added", k
        elif k % 7 == 0:
            # price bumped by exactly +1.00 -> always a changed hash
            assert rows.get(k) == "changed", k
        else:
            assert k not in rows, k


def test_merge_upsert_actions_partition_the_key_space(spark):
    out = {r.c_custkey: r for r in merge_upsert(spark, SF_SMALL).collect()}
    cust_keys = {
        r.c_custkey
        for r in read_table(spark, SF_SMALL, "customer").select("c_custkey").collect()
    }
    order_keys = {
        r.o_custkey
        for r in read_table(spark, SF_SMALL, "orders").select("o_custkey").collect()
    }
    target_keys = {k for k in cust_keys if k % 3 != 0}
    assert set(out) == target_keys | order_keys
    for k, r in out.items():
        if k not in target_keys:
            assert r.merge_action == "inserted" and r.c_name == "UNKNOWN"
            assert r.order_count > 0
        elif k not in order_keys:
            assert r.merge_action == "kept" and r.order_count == 0
        else:
            assert r.merge_action == "updated" and r.order_count > 0
