"""Durable streaming sink: foreachBatch parquet writes must be idempotent
under micro-batch replay (the at-least-once → exactly-once bridge)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.streaming import (
    _events_stream,
    write_stream_idempotent_parquet,
)
from tests.conftest import SF_SMALL


def _start(spark, out_dir, ckpt_dir):
    stream = _events_stream(spark, SF_SMALL).select(
        "event_id", "user_id", "value"
    )
    return write_stream_idempotent_parquet(stream, out_dir, ckpt_dir)


def test_foreachbatch_sink_writes_all_rows(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _start(spark, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    want = spark.read.parquet(os.path.join(SF_SMALL, "events.parquet"))
    assert got.count() == want.count()
    assert "batch_id" in got.columns  # hive partition discovered
    assert got.select(F.sum("event_id")).first()[0] == want.select(
        F.sum("event_id")
    ).first()[0]


def test_foreachbatch_sink_idempotent_on_replay(spark, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = _start(spark, out, ckpt)
    q.processAllAvailable()
    q.stop()
    before = spark.read.parquet(out).count()

    # simulate a failure-replay: wipe the checkpoint so a fresh query
    # re-reads the source and re-emits the same batch ids over the SAME
    # output directory — overwrite-per-batch-dir must not duplicate rows
    import shutil

    shutil.rmtree(ckpt)
    q2 = _start(spark, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == before
