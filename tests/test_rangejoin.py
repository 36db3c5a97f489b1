"""Bin-bucketed interval join: exactness vs the naive range join + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.rangejoin import (
    campaign_windows,
    interval_join,
)
from retail_sales_project_bigdata_spark.plans import physical_plan
from retail_sales_project_bigdata_spark.sources import read_events
from tests.conftest import SF_SMALL


def _naive(ev, camp):
    return ev.join(
        camp,
        (F.col("ts_us") >= F.col("start_us")) & (F.col("ts_us") < F.col("end_us")),
    )


def test_interval_join_matches_naive(spark):
    ev = read_events(spark, SF_SMALL).select("event_id", "ts_us")
    camp = campaign_windows(spark)
    got = {
        (r.event_id, r.campaign_id)
        for r in interval_join(ev, camp).select("event_id", "campaign_id").collect()
    }
    want = {
        (r.event_id, r.campaign_id)
        for r in _naive(ev, camp).select("event_id", "campaign_id").collect()
    }
    assert got == want
    assert want, "campaign grid missed every event — test data drifted"


def test_overlapping_windows_multi_match(spark):
    # 10h windows every 7h: events in the 3h overlap must match twice —
    # the bucket rewrite must neither lose nor duplicate those matches.
    ev = read_events(spark, SF_SMALL).select("event_id", "ts_us")
    multi = (
        interval_join(ev, campaign_windows(spark))
        .groupBy("event_id")
        .count()
        .filter(F.col("count") == 2)
    )
    assert multi.count() > 0


def test_interval_join_is_equi_not_nested_loop(spark):
    # the rewrite's point: a pure range predicate plans as nested-loop /
    # cartesian; the bucketed form must plan as a hash/sort-merge equi-join
    ev = read_events(spark, SF_SMALL).select("event_id", "ts_us")
    plan = physical_plan(interval_join(ev, campaign_windows(spark)))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
