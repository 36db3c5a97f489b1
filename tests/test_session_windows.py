"""Native session_window: streaming result vs batch, watermark-tail law."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.operators.sessions import (
    session_window_stats,
)
from retail_sales_project_bigdata_spark.sources import read_events
from retail_sales_project_bigdata_spark.streaming import (
    streaming_session_windows,
)
from tests.conftest import SF_SMALL

_WATERMARK_US = 10 * 60 * 1_000_000


def test_streaming_sessions_subset_of_batch_plus_tail(spark):
    batch = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.total_value)
        for r in session_window_stats(spark, SF_SMALL).collect()
    }
    stream = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.total_value)
        for r in streaming_session_windows(spark, SF_SMALL).collect()
    }
    # every emitted session is exactly a batch session
    assert stream <= batch
    assert stream, "no session cleared the watermark — data drifted"
    # the only sessions withheld are those still inside the watermark tail
    max_ts = read_events(spark, SF_SMALL).agg(F.max("ts_us")).first()[0]
    horizon = max_ts - _WATERMARK_US
    for row in batch - stream:
        assert row[2] > horizon, f"finalized session not emitted: {row}"
