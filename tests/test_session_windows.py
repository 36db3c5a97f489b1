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


def test_streaming_sliding_value_subset_of_batch_plus_tail(spark):
    """Batch-equivalence witness for ``streaming_sliding_value`` (the
    COVERAGE.md §2.9 witness table entry): in append mode only
    watermark-finalized sliding windows emit, and each emitted window
    must carry exactly the batch sliding-window aggregate; the only
    windows withheld are those whose end lies inside the watermark tail.
    """
    from retail_sales_project_bigdata_spark.functions import pround
    from retail_sales_project_bigdata_spark.streaming import (
        streaming_sliding_value,
    )

    ev = read_events(spark, SF_SMALL)
    batch = {
        (r.window_start, r.window_end, r.n_events, r.total_value)
        for r in ev.groupBy(
            F.window(
                (F.col("ts_us") / 1e6).cast("timestamp"),
                "1 hour",
                "30 minutes",
            ).alias("win")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "total_value",
        )
        .collect()
    }
    stream = {
        (r.window_start, r.window_end, r.n_events, r.total_value)
        for r in streaming_sliding_value(spark, SF_SMALL).collect()
    }
    assert stream <= batch
    assert stream, "no sliding window cleared the watermark — data drifted"
    max_ts = ev.agg(F.max("ts_us")).first()[0]
    horizon_s = (max_ts - _WATERMARK_US) / 1e6
    import datetime as _dt

    horizon = _dt.datetime.fromtimestamp(horizon_s)
    for row in batch - stream:
        assert row[1] > horizon, f"finalized window not emitted: {row}"
