"""Calendar/date-function surface (SURVEY §2.8 — "rebuild adds
``to_date``/``weekofyear``/``date_add`` for the timestamp-typed testdata";
the reference models time as bare integers only).

Both engines use ISO week numbering (1995-01-01 → week 52 of the prior
ISO year), verified by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import net_sales, oracle_sum, stable_sum, pround
from retail_sales_project_bigdata_spark.sources import read_table


def revenue_by_iso_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue on the real calendar (ISO year handled by pinning
    the year to the Thursday of the week, the ISO-year definition)."""
    li = read_table(spark, sf_dir, "lineitem")
    ship_date = F.to_date("l_shipdate")
    # Thursday of the ISO week; Monday-based weekday on both engines
    # (Spark weekday: 0=Mon; DuckDB isodow: 1=Mon) — Sunday-based
    # dayofweek() is 1-based in Spark but 0-based in DuckDB, never use it
    # for cross-engine arithmetic.
    iso_thursday = F.date_add(ship_date, 3 - F.weekday(ship_date))
    return (
        li.withColumn("net_sales", net_sales())
        .groupBy(
            F.year(iso_thursday).alias("iso_year"),
            F.weekofyear(ship_date).alias("iso_week"),
        )
        .agg(
            stable_sum("net_sales").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


REVENUE_BY_ISO_WEEK_SQL = f"""
SELECT CAST(year(CAST(l_shipdate AS DATE)
            + INTERVAL (3 - (isodow(CAST(l_shipdate AS DATE)) - 1)) DAY) AS INT) AS iso_year,
       CAST(weekofyear(CAST(l_shipdate AS DATE)) AS INT) AS iso_week,
       {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
GROUP BY 1, 2
"""


def shipping_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: days between order and ship date, bucketed —
    exercises datediff/date_add/to_date over the fact join."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "delay_days",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")),
    )
    bucket = (
        F.when(F.col("delay_days") < 0, "early")
        .when(F.col("delay_days") <= 30, "0-30")
        .when(F.col("delay_days") <= 90, "31-90")
        .otherwise("90+")
    )
    return joined.groupBy(
        "o_orderpriority", bucket.alias("delay_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("delay_days").alias("min_delay"),
        F.max("delay_days").alias("max_delay"),
    )


SHIPPING_DELAY_BUCKETS_SQL = """
WITH j AS (
  SELECT o.o_orderpriority,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS INT) AS delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CASE WHEN delay_days < 0 THEN 'early'
            WHEN delay_days <= 30 THEN '0-30'
            WHEN delay_days <= 90 THEN '31-90'
            ELSE '90+' END AS delay_bucket,
       COUNT(*) AS n_lines,
       MIN(delay_days) AS min_delay,
       MAX(delay_days) AS max_delay
FROM j GROUP BY 1, 2
"""


def monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc months + month arithmetic over orders."""
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("month_start", F.date_trunc("month", "o_orderdate"))
        .groupBy("month_start")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            stable_sum("o_totalprice").alias("total_value"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


MONTHLY_ORDER_STATS_SQL = """
SELECT date_trunc('month', o_orderdate) AS month_start,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 4) AS total_value,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders GROUP BY 1
"""


ORACLES: dict[str, str] = {
    "revenue_by_iso_week": REVENUE_BY_ISO_WEEK_SQL,
    "shipping_delay_buckets": SHIPPING_DELAY_BUCKETS_SQL,
    "monthly_order_stats": MONTHLY_ORDER_STATS_SQL,
}

QUERIES = {
    "revenue_by_iso_week": revenue_by_iso_week,
    "shipping_delay_buckets": shipping_delay_buckets,
    "monthly_order_stats": monthly_order_stats,
}
