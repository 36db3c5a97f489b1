"""Runtime filtering plan gates — the two Catalyst mechanisms that turn
selective dim filters into fact-side scan/shuffle reduction at 100 TB:

- **Dynamic partition pruning** (DPP): a filter on the dim side of a join
  keyed on the fact's PARTITION column becomes a runtime subquery that
  prunes whole hive-style partition directories before the scan.
- **Runtime bloom-filter injection**: for non-partition join keys, a bloom
  filter built from the filtered creation side is pushed into the
  application side, dropping non-matching rows BEFORE the shuffle (Spark
  injects it when the application side has a shuffle to shrink).

Both are free at production scale only if the plan shapes allow them —
these tests pin that they actually fire.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.sources import read_table
from tests.conftest import SF_SMALL


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    fact_dir = str(tmp_path / "orders_by_priority")
    orders = read_table(spark, SF_SMALL, "orders")
    orders.write.partitionBy("o_orderpriority").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)

    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn("keep", F.col("o_orderpriority").startswith("1"))
    )
    joined = fact.join(dim.filter("keep"), "o_orderpriority")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "dim filter did not become a partition-pruning subquery:\n" + plan
    )
    # and the pruning is semantically right
    expected = orders.filter(F.col("o_orderpriority").startswith("1")).count()
    assert joined.count() == expected


@pytest.fixture
def bloom_filter_confs(spark):
    """Shrink the size thresholds so the 6k-row testdata qualifies for the
    injection the rule applies to multi-GB scans in production."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "1b",
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def test_runtime_bloom_filter_injected(spark, bloom_filter_confs):
    li = read_table(spark, SF_SMALL, "lineitem")
    part = read_table(spark, SF_SMALL, "part").filter(
        F.col("p_retailprice") > 1500
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("l_quantity").alias("qty"))
    joined = per_part.join(part, F.col("l_partkey") == F.col("p_partkey"))

    opt = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom" in opt.lower(), (
        "runtime bloom filter not injected on the shuffle side:\n" + opt
    )
    # bloom filters are lossy only toward keeping rows — results are exact
    n_bloom = joined.count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        n_plain = per_part.join(
            part, F.col("l_partkey") == F.col("p_partkey")
        ).count()
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )
    assert n_bloom == n_plain


def test_analyze_table_statistics_feed_the_optimizer(spark, tmp_path):
    """ANALYZE TABLE must record table row counts and per-column
    min/max/NDV — the inputs cost-based optimization and join sizing use
    when footer estimates aren't enough at scale."""
    tbl = "cust_stats_probe"
    (
        read_table(spark, SF_SMALL, "customer")
        .write.option("path", str(tmp_path / "tbl"))
        .saveAsTable(tbl)
    )
    try:
        spark.sql(f"ANALYZE TABLE {tbl} COMPUTE STATISTICS FOR ALL COLUMNS")
        det = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        }
        n_rows = spark.table(tbl).count()
        assert f"{n_rows} rows" in det["Statistics"]

        col = {
            r.info_name: r.info_value
            for r in spark.sql(f"DESCRIBE EXTENDED {tbl} c_custkey").collect()
        }
        true_min, true_max = (
            spark.table(tbl)
            .agg(F.min("c_custkey"), F.max("c_custkey"))
            .first()
        )
        assert int(col["min"]) == true_min
        assert int(col["max"]) == true_max
        # NDV is HLL-estimated; exact keys here, allow 5% error
        true_ndv = spark.table(tbl).select("c_custkey").distinct().count()
        assert abs(int(col["distinct_count"]) - true_ndv) <= true_ndv * 0.05
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
