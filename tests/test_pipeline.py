"""E2E test of the ETL fan-out (SURVEY §3.1 / §5.3 pipeline smoke)."""

from __future__ import annotations

import os

from retail_sales_project_bigdata_spark.operators.pipeline import (
    run_preprocessing_pipeline,
)
from tests.conftest import SF_SMALL


def test_pipeline_fanout(spark, tmp_path):
    out = run_preprocessing_pipeline(spark, SF_SMALL, str(tmp_path))
    assert set(out) == {"transactions", "temporal", "customer", "item"}

    tx = spark.read.parquet(out["transactions"])
    assert tx.count() == tx.dropDuplicates().count() > 0

    temporal = spark.read.parquet(out["temporal"])
    assert temporal.count() > 0
    # hive partitioning materialized on disk (S5)
    assert any(
        d.startswith("week_no=") for d in os.listdir(out["temporal"])
    ), os.listdir(out["temporal"])

    customer = spark.read.parquet(out["customer"])
    assert customer.count() == 150
    assert any(d.startswith("mktsegment=") for d in os.listdir(out["customer"]))

    item = spark.read.parquet(out["item"])
    assert item.count() > 0
    assert any(d.startswith("l_returnflag=") for d in os.listdir(out["item"]))


def test_pipeline_partition_pruning(spark, tmp_path):
    """Reading one partition of a partitionBy output must scan only it."""
    out = run_preprocessing_pipeline(spark, SF_SMALL, str(tmp_path))
    from pyspark.sql import functions as F

    from retail_sales_project_bigdata_spark.plans import physical_plan

    df = spark.read.parquet(out["item"]).filter(F.col("l_returnflag") == "R")
    plan = physical_plan(df)
    assert "PartitionFilters" in plan
    assert "l_returnflag" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
