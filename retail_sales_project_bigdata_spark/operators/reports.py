"""Ranking / top-k reports (SURVEY §2.6 O1-O4, §2.4 A9).

Re-expresses ``top_products_by_count.py`` (count → sort desc → limit) and
adds the canonical windowed top-k-per-group pattern the reference reaches
via ALS's internal ``recommendForAllUsers`` (O4).

Determinism: every limit/rank is given a total order (count desc, then key
asc) so the oracle comparison and reruns are stable — the reference's
unsorted ``take(50)`` (MarketBasketAnalysis.java:186-198) is exactly the
anti-pattern §4.3.6 forbids.

Scale: top-k over a groupBy output is a shuffle of pre-aggregated rows
(tiny); the global sort-limit is a TakeOrderedAndProject — no full sort at
any scale.  Top-k *per group* uses a ranking window partitioned by the
group key — one shuffle, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from retail_sales_project_bigdata_spark.functions import (
    net_sales,
    oracle_sum,
    ordered_sum,
    pround,
    stable_sum,
)
from retail_sales_project_bigdata_spark.sources import read_table

TOP_N_PRODUCTS = 100  # top_products_by_count.py topN analog
TOP_K_PER_GROUP = 3


def top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 + O1 + O2: transaction counts per (product, name), desc, limit.

    ``top_products_by_count.py:17-24`` — count(lit(1)) grouped by id+name,
    orderBy desc, limit.  Tie-break on partkey for determinism.
    """
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "inner")
        .groupBy("l_partkey", "p_name")
        .agg(F.count(F.lit(1)).alias("tx_count"))
        .orderBy(F.desc("tx_count"), F.asc("l_partkey"))
        .limit(TOP_N_PRODUCTS)
    )


TOP_PRODUCTS_SQL = f"""
SELECT l.l_partkey, p.p_name, COUNT(*) AS tx_count
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY l.l_partkey, p.p_name
ORDER BY tx_count DESC, l.l_partkey ASC
LIMIT {TOP_N_PRODUCTS}
"""


def top_parts_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k per group (O4 pattern): top-3 parts by revenue per
    supplier.  Rank window with a total order (revenue desc, partkey asc).
    """
    li = read_table(spark, sf_dir, "lineitem")
    rev = (
        li.withColumn("net_sales", net_sales())
        .groupBy("l_suppkey", "l_partkey")
        .agg(stable_sum("net_sales").alias("revenue"))
    )
    w = Window.partitionBy("l_suppkey").orderBy(
        F.desc("revenue"), F.asc("l_partkey")
    )
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K_PER_GROUP)
        .select("l_suppkey", "l_partkey", "revenue", "rank")
    )


TOP_PARTS_PER_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, l_partkey,
         {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS revenue
  FROM lineitem GROUP BY l_suppkey, l_partkey
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY l_suppkey ORDER BY revenue DESC, l_partkey ASC) AS rank
  FROM rev
)
SELECT l_suppkey, l_partkey, revenue, rank
FROM ranked WHERE rank <= {TOP_K_PER_GROUP}
"""


def sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop dim join rollup: lineitem→orders→customer→nation→region.

    Exercises the full star-schema join path (J7 3-way-join analog,
    SegmentationFeatureEngineering.java:33-35) with every dim broadcast.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", net_sales().alias("net_sales")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            stable_sum("net_sales").alias("revenue"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


SALES_BY_REGION_SQL = f"""
SELECT r.r_name, n.n_name,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       COUNT(DISTINCT o.o_custkey) AS n_customers
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary — the canonical OLAP rollup the
    § guide names; exercises 2-key grouping with 8 aggregates."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_sum("l_quantity").alias("sum_qty"),
            stable_sum("l_extendedprice").alias("sum_base_price"),
            stable_sum(net_sales()).alias("sum_disc_price"),
            # charge sits on a SIX-decimal grid (2-dec price x 2-dec
            # disc x 2-dec tax) — round AT that grid; scale 4 would sit
            # below it and hit exact .xxxx5 ties (functions docstring).
            stable_sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                scale=6,
            ).alias("sum_charge"),
            pround(pround(F.sum("l_quantity"), 4) / F.count(F.lit(1)), 6).alias(
                "avg_qty"
            ),
            pround(
                pround(F.sum("l_extendedprice"), 4) / F.count(F.lit(1)), 6
            ).alias("avg_price"),
            pround(pround(F.sum("l_discount"), 4) / F.count(F.lit(1)), 6).alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {oracle_sum('l_quantity')} AS sum_qty,
       {oracle_sum('l_extendedprice')} AS sum_base_price,
       {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS sum_disc_price,
       {oracle_sum('l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)', 6)} AS sum_charge,
       ROUND(ROUND(SUM(l_quantity), 4) / COUNT(*), 6) AS avg_qty,
       ROUND(ROUND(SUM(l_extendedprice), 4) / COUNT(*), 6) AS avg_price,
       ROUND(ROUND(SUM(l_discount), 4) / COUNT(*), 6) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def supplier_revenue_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank windows (percent_rank / cume_dist / ntile) over
    per-supplier revenue — the analytic complement of the ranking windows
    (W1 row_number, RFM ntile): where does each supplier sit in the
    revenue distribution?

    Engine parity is exact: the order key is the grid-rounded
    ``stable_sum`` revenue (identical doubles both engines) with the
    supplier key as unique tiebreak, so rank == row_number and
    percent_rank/cume_dist/ntile are pure integer arithmetic on
    (rn, n) evaluated in IEEE doubles — identical across engines.

    Scale (VERDICT r1 item 1): |suppliers| grows with the business, so
    the former global window (single-task sort) is replaced by the
    two-phase :func:`ranking.global_row_number` — range exchange +
    partitioned window + broadcast offsets; no unpartitioned WindowExec
    remains (plan-asserted).
    """
    from retail_sales_project_bigdata_spark.operators.ranking import (
        cume_dist_from_rn,
        global_row_number,
        ntile_from_rn,
        percent_rank_from_rn,
        with_total_count,
    )

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", net_sales().alias("net_sales")
    )
    rev = li.groupBy("l_suppkey").agg(
        stable_sum("net_sales").alias("revenue")
    )
    ranked = global_row_number(
        with_total_count(rev),
        [F.asc("revenue"), F.asc("l_suppkey")],
        "_rn",
    )
    rn, n = F.col("_rn"), F.col("_n_total")
    return ranked.select(
        "l_suppkey",
        "revenue",
        percent_rank_from_rn(rn, n).alias("pct_rank"),
        cume_dist_from_rn(rn, n).alias("cume"),
        ntile_from_rn(rn, n, 10).alias("decile"),
    )


SUPPLIER_REVENUE_RANKS_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS revenue
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey, revenue,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume,
       CAST(ntile(10) OVER w AS INT) AS decile
FROM rev
WINDOW w AS (ORDER BY revenue ASC, l_suppkey ASC)
"""


Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1997-06-01"
Q5_REGION = "ASIA"
Q10_TOP_N = 20


def order_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (adapted to the testdata's columns): unshipped-as-of
    revenue per urgent order for one market segment — the canonical
    fact ⋈ fact ⋈ dim + agg + global top-10 benchmark query.

    Scale: the customer filter broadcasts onto orders; orders⋈lineitem is
    the one big shuffle (AQE picks SMJ at real scale); the top-10 is a
    TakeOrderedAndProject on the aggregated frame (no global sort)."""
    cust = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == Q3_SEGMENT)
        .select("c_custkey")
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit(Q3_CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit(Q3_CUTOFF).cast("timestamp"))
        .withColumn("net_sales", net_sales())
        .select("l_orderkey", "net_sales")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("odate"),
            "o_orderpriority",
        )
        .agg(stable_sum("net_sales").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


ORDER_SHIPPING_PRIORITY_SQL = f"""
SELECT l.l_orderkey,
       CAST(o.o_orderdate AS DATE)::VARCHAR AS odate,
       o.o_orderpriority,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)::VARCHAR, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation where the ordering customer and
    the supplying supplier sit in the SAME nation, one region, one year.

    Scale: all four dims broadcast (customer is the largest but still
    dim-sized next to the facts); the single fact-fact shuffle is
    lineitem ⋈ orders on orderkey; the same-nation predicate rides the
    broadcast joins as an equi-condition, never a post-filter on a
    cross product."""
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = (
        read_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == Q5_REGION)
        .select("r_regionkey")
    )
    nations_in_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .withColumn("net_sales", net_sales())
        .select("l_orderkey", "l_suppkey", "net_sales")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(
            F.broadcast(nations_in_region),
            supp.s_nationkey == nations_in_region.n_nationkey,
        )
        .groupBy("n_name")
        .agg(stable_sum("net_sales").alias("revenue"))
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n.n_name,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n.n_name
"""


def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-{Q10_TOP_N} customers by revenue lost to
    returned items (returnflag 'R') in one quarter, with their nation.

    Scale: same join topology as Q3 plus a broadcast nation lookup; the
    per-customer aggregate shuffles once on custkey."""
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .withColumn("net_sales", net_sales())
        .select("l_orderkey", "net_sales")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(stable_sum("net_sales").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(Q10_TOP_N)
    )


RETURNED_ITEM_REPORT_SQL = f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT {Q10_TOP_N}
"""


def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation's revenue as a share of its region and
    of the grand total.

    The shares are windows OVER THE AGGREGATED frame (|nation| rows), so
    the only fact-sized work is the initial rollup — the share windows
    shuffle 25 rows.  Totals use the ordered-fold sum (sort + left fold)
    so both engines add identical doubles in identical order; the
    region-partitioned window is deterministic the same way."""
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .withColumn("net_sales", net_sales())
        .select("l_orderkey", "net_sales")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(stable_sum("net_sales").alias("revenue"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return rev.select(
        "n_name",
        "r_name",
        "revenue",
        pround(
            F.col("revenue") / ordered_sum("revenue", w_region), 6
        ).alias("region_share"),
        pround(
            F.col("revenue") / ordered_sum("revenue", w_all), 6
        ).alias("global_share"),
    )


NATION_REVENUE_SHARE_SQL = f"""
WITH rev AS (
  SELECT n.n_name, r.r_name,
         {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY n.n_name, r.r_name
)
SELECT n_name, r_name, revenue,
       ROUND(revenue / list_aggregate(list_sort(list(revenue) OVER w_region), 'sum'), 6)
         AS region_share,
       ROUND(revenue / list_aggregate(list_sort(list(revenue) OVER w_all), 'sum'), 6)
         AS global_share
FROM rev
WINDOW w_region AS (PARTITION BY r_name),
       w_all AS ()
"""


def nation_extreme_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation argmax/argmin: the highest- and lowest-revenue customer
    of each nation via ``max_by``/``min_by`` over a composite
    (revenue, custkey) ordering struct — the deterministic-tie-break form
    of SQL's ``arg_max`` (ties in revenue resolve to the higher/lower
    custkey, so the answer is engine- and partitioning-independent).

    Scale shape: one fact shuffle to the (nation, customer) revenue
    grain, then the extremes aggregate a customer-sized frame; max_by
    carries the winner through partial aggregation without a sort or a
    join-back (vs the window row_number formulation the oracle uses)."""
    nat = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    rev = (
        read_table(spark, sf_dir, "lineitem")
        .withColumn("net_sales", net_sales())
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(stable_sum("net_sales").alias("revenue"))
    )
    ordkey = F.struct(F.col("revenue"), F.col("c_custkey"))
    return (
        rev.groupBy("n_name")
        .agg(
            F.max_by("c_name", ordkey).alias("top_customer"),
            F.max("revenue").alias("top_revenue"),
            F.min_by("c_name", ordkey).alias("bottom_customer"),
            F.min("revenue").alias("bottom_revenue"),
        )
        .orderBy("n_name")
    )


NATION_EXTREME_CUSTOMERS_SQL = f"""
WITH rev AS (
  SELECT n_name, c.c_custkey, c.c_name,
         {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS revenue
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer c ON c.c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1, 2, 3
), ranked AS (
  SELECT n_name, c_name, revenue,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY revenue DESC, c_custkey DESC) AS rn_top,
         ROW_NUMBER() OVER (PARTITION BY n_name
                            ORDER BY revenue ASC, c_custkey ASC) AS rn_bot
  FROM rev
)
SELECT n_name,
       MIN(CASE WHEN rn_top = 1 THEN c_name END) AS top_customer,
       MAX(revenue) AS top_revenue,
       MIN(CASE WHEN rn_bot = 1 THEN c_name END) AS bottom_customer,
       MIN(revenue) AS bottom_revenue
FROM ranked
GROUP BY 1
ORDER BY 1
"""


TOP_TYPES_PER_NATION = 3


def nation_top_types_with_others(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-N-with-OTHERS report: per supplier nation, the 3 highest-revenue
    part types plus one OTHER row lumping the tail — the standard
    dashboard shape (bounded output per group, nothing dropped).

    Two aggregations: fact-side rollup to (nation, type) — the only
    fact-sized shuffle — then a rank window and a re-aggregate over the
    tiny (|nations|×|types|) frame.  Re-rounding applies at each sum of
    grid values (stable_sum discipline)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", net_sales().alias("net_sales")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("n_name", "p_type")
        .agg(stable_sum("net_sales").alias("type_rev"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("type_rev"), F.asc("p_type")
    )
    labeled = rev.withColumn("rk", F.row_number().over(w)).withColumn(
        "type_label",
        F.when(F.col("rk") <= TOP_TYPES_PER_NATION, F.col("p_type")).otherwise(
            F.lit("OTHER")
        ),
    )
    return labeled.groupBy("n_name", "type_label").agg(
        pround(F.sum("type_rev"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_types"),
        F.min("rk").alias("best_rank"),
    )


NATION_TOP_TYPES_WITH_OTHERS_SQL = f"""
WITH rev AS (
  SELECT n.n_name, p.p_type,
         {oracle_sum("l.l_extendedprice * (1.0 - l.l_discount)")} AS type_rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY n.n_name, p.p_type
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY n_name ORDER BY type_rev DESC, p_type ASC) AS rk
  FROM rev
),
labeled AS (
  SELECT n_name,
         CASE WHEN rk <= {TOP_TYPES_PER_NATION} THEN p_type
              ELSE 'OTHER' END AS type_label,
         type_rev, rk
  FROM ranked
)
SELECT n_name, type_label,
       ROUND(SUM(type_rev), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(MIN(rk) AS INT) AS best_rank
FROM labeled GROUP BY n_name, type_label
"""


def household_penetration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Household penetration per product — distinct buying households over
    total panel households (completes the reference's named-but-empty
    ``HouseholdPenetration.java:3-9`` placeholder; VERDICT r1 item 6).

    Scale: lineitem ⋈ orders is the one fact shuffle; the per-product
    countDistinct is one more (partial-agg'd); the panel-size scalar is a
    1-row aggregate broadcast back via crossJoin — no driver round-trip.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    facts = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    per_prod = facts.groupBy(F.col("l_partkey").alias("product_id")).agg(
        F.countDistinct("o_custkey").alias("n_households")
    )
    total = read_table(spark, sf_dir, "customer").agg(
        F.countDistinct("c_custkey").alias("total_households")
    )
    return per_prod.crossJoin(F.broadcast(total)).select(
        "product_id",
        "n_households",
        "total_households",
        pround(
            F.col("n_households").cast("double") / F.col("total_households"),
            6,
        ).alias("penetration"),
    )


HOUSEHOLD_PENETRATION_SQL = """
WITH per_prod AS (
  SELECT l_partkey AS product_id,
         COUNT(DISTINCT o_custkey) AS n_households
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY l_partkey
),
total AS (SELECT COUNT(DISTINCT c_custkey) AS total_households FROM customer)
SELECT product_id, n_households, total_households,
       ROUND(CAST(n_households AS DOUBLE) / total_households, 6) AS penetration
FROM per_prod CROSS JOIN total
"""


SKYLINE_BUCKETS = 8


def skyline_2d(
    df: DataFrame,
    maximize_col: str,
    minimize_col: str,
    n_buckets: int = SKYLINE_BUCKETS,
) -> DataFrame:
    """Distributed 2-D skyline (Pareto frontier): rows not dominated by
    any other row — t dominates s iff t is ≥ on the maximize axis and ≤
    on the minimize axis, strictly better on at least one.  Duplicated
    (max, min) points survive together (no strict edge either way).

    Scale shape — the bucketed skyline, NOT a global window and NOT the
    quadratic NOT-EXISTS the oracle uses:

    1. ``repartitionByRange`` on the maximize axis desc into a CONSTANT
       number of buckets; equal keys land in one bucket, so earlier
       buckets are strictly greater on the maximize axis.
    2. Within each bucket, two bucket-partitioned windows decide local
       dominance: the running min of the minimize axis over strictly
       greater maximize values (desc range frame), and the min within
       the same maximize value.  Every window partition is one bucket —
       there is no task that owns the full frame.
    3. Cross-bucket dominance collapses to ONE number per bucket: the
       prefix-min of each earlier bucket's best minimize value.  That is
       a ``n_buckets``-row aggregate — collected and broadcast back,
       the same tiny-boundary-broadcast pattern as the two-phase
       ranking module (:mod:`ranking`).

    Total cost: one range exchange of the (already aggregated) frame +
    one constant-size aggregate; survives any |rows| that the upstream
    aggregate survives.
    """
    bucketed = (
        df.repartitionByRange(n_buckets, F.desc(maximize_col))
        .withColumn("_bucket", F.spark_partition_id())
        .persist()  # three consumers: bucket summary + both window passes
    )
    summaries = sorted(
        bucketed.groupBy("_bucket")
        .agg(F.min(minimize_col).alias("_best"))
        .collect(),
        key=lambda r: r["_bucket"],
    )
    thresholds, best_so_far = [], None
    for row in summaries:
        thresholds.append((row["_bucket"], best_so_far))
        best_so_far = (
            row["_best"]
            if best_so_far is None
            else min(best_so_far, row["_best"])
        )
    spark = df.sparkSession
    thr = spark.createDataFrame(
        thresholds, schema="_bucket int, _earlier_best long"
    )
    w_higher = (
        Window.partitionBy("_bucket")
        .orderBy(F.desc(maximize_col))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("_bucket", maximize_col)
    scored = (
        bucketed.join(F.broadcast(thr), "_bucket")
        .withColumn("_m_higher", F.min(minimize_col).over(w_higher))
        .withColumn("_m_same", F.min(minimize_col).over(w_same))
    )
    mn = F.col(minimize_col)
    survivors = scored.filter(
        (F.col("_m_higher").isNull() | (F.col("_m_higher") > mn))
        & (mn == F.col("_m_same"))
        & (F.col("_earlier_best").isNull() | (mn < F.col("_earlier_best")))
    )
    return survivors.drop("_bucket", "_earlier_best", "_m_higher", "_m_same")


def pareto_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier suppliers on (total revenue ↑, worst-case ship
    latency ↓): no other supplier earns at least as much AND ships no
    slower, strictly better on one axis — the supplier-scorecard skyline
    ("who is both big and reliable").

    Metrics are exact integers (revenue in cents, latency in whole days
    from order date to ship date), so dominance never touches floats.
    The frontier itself runs through :func:`skyline_2d` (bucketed, no
    global window); the DuckDB oracle keeps the textbook quadratic
    NOT-EXISTS formulation, proving the distributed rewrite equivalent.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supplier = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    per_sup = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
            ).alias("revenue_cents"),
            F.max(
                F.datediff(
                    F.col("l_shipdate").cast("date"),
                    F.col("o_orderdate").cast("date"),
                )
            )
            .cast("long")
            .alias("max_delay_days"),
        )
    )
    frontier = skyline_2d(per_sup, "revenue_cents", "max_delay_days")
    return frontier.join(F.broadcast(supplier), "s_suppkey").select(
        "s_suppkey", "s_name", "revenue_cents", "max_delay_days"
    )


PARETO_SUPPLIERS_SQL = """
WITH per_sup AS (
  SELECT l.l_suppkey AS s_suppkey,
         CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
              AS BIGINT) AS revenue_cents,
         CAST(MAX(datediff('day', CAST(o.o_orderdate AS DATE),
                           CAST(l.l_shipdate AS DATE))) AS BIGINT)
           AS max_delay_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1
)
SELECT p.s_suppkey, s.s_name, p.revenue_cents, p.max_delay_days
FROM per_sup p JOIN supplier s ON p.s_suppkey = s.s_suppkey
WHERE NOT EXISTS (
  SELECT 1 FROM per_sup t
  WHERE t.revenue_cents >= p.revenue_cents
    AND t.max_delay_days <= p.max_delay_days
    AND (t.revenue_cents > p.revenue_cents
         OR t.max_delay_days < p.max_delay_days)
)
"""


ORACLES: dict[str, str] = {
    "pareto_suppliers": PARETO_SUPPLIERS_SQL,
    "household_penetration": HOUSEHOLD_PENETRATION_SQL,
    "nation_top_types_with_others": NATION_TOP_TYPES_WITH_OTHERS_SQL,
    "nation_extreme_customers": NATION_EXTREME_CUSTOMERS_SQL,
    "nation_revenue_share": NATION_REVENUE_SHARE_SQL,
    "top_products": TOP_PRODUCTS_SQL,
    "top_parts_per_supplier": TOP_PARTS_PER_SUPPLIER_SQL,
    "sales_by_region": SALES_BY_REGION_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
    "supplier_revenue_ranks": SUPPLIER_REVENUE_RANKS_SQL,
    "order_shipping_priority": ORDER_SHIPPING_PRIORITY_SQL,
    "local_supplier_volume": LOCAL_SUPPLIER_VOLUME_SQL,
    "returned_item_report": RETURNED_ITEM_REPORT_SQL,
}

QUERIES = {
    "pareto_suppliers": pareto_suppliers,
    "household_penetration": household_penetration,
    "nation_top_types_with_others": nation_top_types_with_others,
    "nation_extreme_customers": nation_extreme_customers,
    "nation_revenue_share": nation_revenue_share,
    "top_products": top_products,
    "top_parts_per_supplier": top_parts_per_supplier,
    "sales_by_region": sales_by_region,
    "pricing_summary": pricing_summary,
    "supplier_revenue_ranks": supplier_revenue_ranks,
    "order_shipping_priority": order_shipping_priority,
    "local_supplier_volume": local_supplier_volume,
    "returned_item_report": returned_item_report,
}
