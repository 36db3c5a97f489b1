"""Cleaning / derived-column operators (SURVEY §2.2 P1-P17).

Re-expresses ``FullPreprocessingPipeline.java``'s transform chain on the
testdata mapping (FIXTURES.md §B): filters out non-positive quantities
(``:73-74``), derives ``net_sales`` / ``unit_price`` / ``discount_rate``
with when-guarded division (``:77-100``), discount & campaign flags
(``:121-134``), integer ``day`` and ``week_no = ceil(day/7)`` (``:157-162``),
and the single-pass null-profile that replaces the reference's
one-job-per-column loop (``:103-113``, anti-pattern §4.3.1).

All expressions are built-in column functions — whole-stage-codegen'd,
no Python involvement at execution time.  Per-row arithmetic is IEEE-double
deterministic so the oracle compares unrounded values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import (
    DAY_EPOCH,
    day_index,
    day_of_week,
    net_sales,
    safe_div,
    week_no,
)
from retail_sales_project_bigdata_spark.sources import read_table


def clean_lineitem(
    spark: SparkSession, sf_dir: str, extra_cols: tuple[str, ...] = ()
) -> DataFrame:
    """The cleaned transaction-line fact ("item" table analog,
    FullPreprocessingPipeline.java:214-225).

    ``extra_cols`` carries additional source columns through the
    projection (the pipeline keeps ``l_returnflag`` for its partitioned
    sink this way — re-joining the fact to itself to recover a dropped
    column would cost a second full scan plus a fact×fact shuffle).

    Scale note: pure narrow transforms — no shuffle; filters and the
    14-column projection push into the parquet scan.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") >= 0))
        .withColumn("day", day_index("l_shipdate"))
        .select(
            *extra_cols,
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("sales_value"),
            "day",
            week_no("day").alias("week_no"),
            day_of_week("day").alias("day_of_week"),
            net_sales().alias("net_sales"),
            safe_div(F.col("l_extendedprice"), F.col("l_quantity")).alias("unit_price"),
            safe_div(
                F.col("l_extendedprice") * F.col("l_discount"),
                F.col("l_extendedprice"),
            ).alias("discount_rate"),
            F.when(F.col("l_discount") > 0, 1).otherwise(0).alias("is_discounted"),
            F.when(F.col("l_tax") > 0, 1).otherwise(0).alias("campaign_flag"),
        )
    )


CLEAN_LINEITEM_SQL = f"""
SELECT
  l_orderkey,
  l_partkey,
  l_suppkey,
  l_linenumber,
  l_quantity AS quantity,
  l_extendedprice AS sales_value,
  CAST(datediff('day', DATE '{DAY_EPOCH}', CAST(l_shipdate AS DATE)) + 1 AS INT) AS day,
  CAST(CEIL((datediff('day', DATE '{DAY_EPOCH}', CAST(l_shipdate AS DATE)) + 1) / 7.0) AS INT) AS week_no,
  CAST(((datediff('day', DATE '{DAY_EPOCH}', CAST(l_shipdate AS DATE)) + 1 - 1) % 7) + 1 AS INT) AS day_of_week,
  l_extendedprice * (1.0 - l_discount) AS net_sales,
  CASE WHEN l_quantity <> 0 THEN l_extendedprice / l_quantity ELSE 0.0 END AS unit_price,
  CASE WHEN l_extendedprice <> 0 THEN (l_extendedprice * l_discount) / l_extendedprice ELSE 0.0 END AS discount_rate,
  CASE WHEN l_discount > 0 THEN 1 ELSE 0 END AS is_discounted,
  CASE WHEN l_tax > 0 THEN 1 ELSE 0 END AS campaign_flag
FROM lineitem
WHERE l_quantity > 0 AND l_extendedprice >= 0
"""


def null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass non-null count per column (P16).

    Replaces the reference's per-column ``filter(isNull).count()`` loop
    (FullPreprocessingPipeline.java:103-109 — one full scan *per column*)
    with ONE aggregation job: ``count(col)`` counts non-nulls.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count(F.col(c)).alias(f"nn_{c}") for c in li.columns],
    )


NULL_PROFILE_SQL = """
SELECT
  COUNT(*) AS n_rows,
  COUNT(l_orderkey) AS nn_l_orderkey,
  COUNT(l_partkey) AS nn_l_partkey,
  COUNT(l_suppkey) AS nn_l_suppkey,
  COUNT(l_linenumber) AS nn_l_linenumber,
  COUNT(l_quantity) AS nn_l_quantity,
  COUNT(l_extendedprice) AS nn_l_extendedprice,
  COUNT(l_discount) AS nn_l_discount,
  COUNT(l_tax) AS nn_l_tax,
  COUNT(l_returnflag) AS nn_l_returnflag,
  COUNT(l_linestatus) AS nn_l_linestatus,
  COUNT(l_shipdate) AS nn_l_shipdate
FROM lineitem
"""


def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (basket, product) pairs (P14) —
    FullPreprocessingPipeline.java:148-154's ``transactions`` output.

    ``dropDuplicates`` on the two keys → hash-aggregate with map-side
    partial dedup; shuffles only the already-deduped key pairs.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_partkey").dropDuplicates()


BASKET_PAIRS_SQL = "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem"


ORACLES: dict[str, str] = {
    "clean_lineitem": CLEAN_LINEITEM_SQL,
    "null_profile": NULL_PROFILE_SQL,
    "basket_pairs": BASKET_PAIRS_SQL,
}

QUERIES = {
    "clean_lineitem": clean_lineitem,
    "null_profile": null_profile,
    "basket_pairs": basket_pairs,
}
