"""The end-to-end ETL fan-out (SURVEY §3.1) — FullPreprocessingPipeline.java.

One cleaned transaction frame fans out to four persisted outputs:

| output | grain | partitioning | reference |
|---|---|---|---|
| transactions | distinct (basket, product) | none | ``:148-154`` |
| temporal | (store, product, week) rollup | week_no | ``:164-175`` |
| customer | RFM + demographics | mktsegment | ``:180-211`` (income_desc analog) |
| item | cleaned line fact | l_returnflag | ``:214-225`` (department analog) |

Anti-pattern fixes applied (SURVEY §4.3): the shared upstream is
``persist()``-ed once and unpersisted after the last sink (the reference
re-scans the CSV ~8×, ``:228-231``); row-count logging is opt-in; the
null-column probe is the single-pass variant.

Scale: the persist is MEMORY_AND_DISK — at 100 TB you'd checkpoint the
cleaned frame to parquet and derive the other sinks from that (noted in
§4.3.3); the fan-out writes are independent jobs sharing one cached scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from retail_sales_project_bigdata_spark.operators.cleaning import clean_lineitem
from retail_sales_project_bigdata_spark.operators.rfm import rfm_demographics
from retail_sales_project_bigdata_spark.functions import (
    ordered_avg,
    stable_sum,
)
from retail_sales_project_bigdata_spark.sources import read_table, write_parquet


def run_preprocessing_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    verbose: bool = False,
) -> dict[str, str]:
    """Run the full fan-out; returns {output_name: path}.

    ``verbose=True`` restores the reference's row-count logging
    (FullPreprocessingPipeline.java:48,228-231) as extra count() jobs —
    off by default per §4.3.5.
    """
    # l_returnflag rides the cleaning projection — re-joining the fact
    # to itself to recover it would re-scan lineitem and shuffle both
    # sides on the composite key before anything is written.
    item = clean_lineitem(spark, sf_dir, extra_cols=("l_returnflag",))
    item.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        outputs: dict[str, str] = {}

        transactions = item.select("l_orderkey", "l_partkey").dropDuplicates()
        p = os.path.join(out_dir, "transactions")
        write_parquet(transactions, p)
        outputs["transactions"] = p

        temporal = item.groupBy(
            F.col("l_suppkey").alias("store_id"),
            F.col("l_partkey").alias("product_id"),
            "week_no",
        ).agg(
            stable_sum("net_sales").alias("sum_net_sales"),
            stable_sum("quantity").alias("sum_quantity"),
            # ratio-valued input: canonical-order fold, NOT stable_avg
            # (functions docstring — ratios are not on a decimal grid)
            ordered_avg("unit_price").alias("avg_unit_price"),
            F.max("is_discounted").alias("any_discounted"),
        )
        p = os.path.join(out_dir, "temporal")
        write_parquet(temporal, p, partition_by="week_no")
        outputs["temporal"] = p

        customer = rfm_demographics(spark, sf_dir)
        p = os.path.join(out_dir, "customer")
        write_parquet(customer, p, partition_by="mktsegment")
        outputs["customer"] = p

        p = os.path.join(out_dir, "item")
        write_parquet(item, p, partition_by="l_returnflag")
        outputs["item"] = p

        if verbose:
            for name in outputs:
                n = spark.read.parquet(outputs[name]).count()
                print(f"[pipeline] {name}: {n} rows")
        return outputs
    finally:
        item.unpersist()
