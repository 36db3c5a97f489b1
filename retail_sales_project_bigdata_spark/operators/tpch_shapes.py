"""TPC-H-shaped benchmark queries, batch 2 (Q13/Q14/Q15/Q18/Q19/Q21/Q22).

The reference publishes no benchmark suite (SURVEY §6), so the engine's
throughput story is anchored on canonical analytic shapes over the driver
testdata.  ``reports.py`` carries Q1/Q3/Q5/Q10; this module adds the
remaining shapes expressible on the testdata star schema, each chosen for
a DISTINCT optimizer/physical pattern:

- Q13: outer-join aggregate → aggregate-of-aggregate (customer order-count
  distribution, zeros included).
- Q14: conditional aggregation ratio over a fact ⋈ dim join (promo share).
- Q15: scalar-subquery max over a derived revenue view (top supplier).
- Q18: HAVING-filtered semi join fact→fact (large-volume orders).
- Q19: disjunction of conjunctive predicates spanning both join sides —
  the classic "OR-of-ANDs" pushdown test.
- Q21: layered EXISTS / NOT EXISTS self-joins (waiting supplier).
- Q22: anti join + scalar-subquery average (idle wealthy customers).

Adaptations to the testdata schema (no partsupp/l_shipmode/l_commitdate/
l_receiptdate/c_phone — TESTDATA.md): Q14's PROMO test is equality on the
single-word ``p_type``; Q21's "late" predicate is ``l_shipdate >
o_orderdate + 60 days`` (the commit/receipt-date lag analog); Q22 groups
by ``c_mktsegment`` instead of phone country code and its "no orders"
clause is bounded to orders after a cutoff (every testdata customer has
some order).

Scale notes: every dim side is broadcast (read_table hints); the only
big shuffles are fact-keyed groupBys and the lineitem⋈orders equi join.
Q13's left join shuffles orders on custkey once, then re-aggregates a
customer-sized frame.  Q19 evaluates the OR-of-ANDs as a post-join
conjunctive residual on a broadcast hash join — no cross product, and the
per-branch part predicates (brand+size) prune the broadcast build side.
Q21 reuses ONE (orderkey,suppkey)-grained frame for both the EXISTS and
NOT-EXISTS probes, so the order-level self-join state is built once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import (
    stable_avg,
    net_sales,
    oracle_sum,
    pround,
    stable_sum,
)
from retail_sales_project_bigdata_spark.sources import read_table

Q13_EXCLUDED_PRIORITY = "1-URGENT"
Q14_MONTH_START = "1996-03-01"
Q14_MONTH_END = "1996-04-01"
Q15_QTR_START = "1996-01-01"
Q15_QTR_END = "1996-04-01"
Q18_MIN_QTY = 300
Q21_LATE_DAYS = 60
Q21_TOP_N = 20
Q22_CUTOFF = "1997-06-01"


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: how many customers placed exactly N orders (N≥0),
    counting only non-urgent orders.

    The left join keeps order-less customers (count 0); the outer
    aggregate runs over a customer-sized frame — at 100 TB the only big
    shuffle is orders on o_custkey, and the second aggregate's input is
    |customer| rows, already tiny relative to the fact."""
    cust = read_table(spark, sf_dir, "customer", broadcast_dims=False).select(
        "c_custkey"
    )
    orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY)
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


ORDER_COUNT_DISTRIBUTION_SQL = f"""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '{Q13_EXCLUDED_PRIORITY}'
  GROUP BY c.c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percentage of one month's revenue from PROMO-type parts.

    Conditional-sum ratio; the part join broadcasts, lineitem aggregates
    to a single row with map-side partials — no data-sized shuffle at
    all.  Engine-portable float discipline: both sums rounded on the
    4-decimal grid before the division (functions.stable_sum)."""
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q14_MONTH_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q14_MONTH_END).cast("timestamp"))
        )
        .withColumn("net_sales", net_sales())
        .select("l_partkey", "net_sales")
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.agg(
        pround(
            F.lit(100.0)
            * stable_sum(
                F.when(F.col("p_type") == "PROMO", F.col("net_sales")).otherwise(
                    0.0
                )
            )
            / stable_sum("net_sales"),
            6,
        ).alias("promo_pct")
    )


PROMO_REVENUE_SHARE_SQL = f"""
SELECT ROUND(
  100.0
  * {oracle_sum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1.0 - l.l_discount) ELSE 0.0 END")}
  / {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')},
  6) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{Q14_MONTH_START} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{Q14_MONTH_END} 00:00:00'
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) whose one-quarter revenue equals the max.

    The revenue view shuffles lineitem once on suppkey; the scalar max is
    a broadcast single-row crossJoin (Spark's scalar-subquery plan), so
    the view is NOT recomputed twice at scale.  Revenue is grid-rounded
    (stable_sum) making the equality-with-max comparison portable."""
    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit(Q15_QTR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q15_QTR_END).cast("timestamp"))
        )
        .withColumn("net_sales", net_sales())
        .select("l_suppkey", "net_sales")
    )
    rev = li.groupBy("l_suppkey").agg(
        stable_sum("net_sales").alias("total_revenue")
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_revenue"))
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(
            F.broadcast(max_rev),
            rev.total_revenue == max_rev.max_revenue,
        )
        .join(supp, rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT l_suppkey,
         {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q15_QTR_START} 00:00:00'
    AND l_shipdate <  TIMESTAMP '{Q15_QTR_END} 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
"""


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: customers behind orders totalling > {Q18_MIN_QTY} units.

    The HAVING subquery and the detail join share the lineitem-on-orderkey
    shuffle; Spark reuses the aggregated frame as the semi side.  Output
    is order-grained with the order's total quantity."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > Q18_MIN_QTY)
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        orders.join(big_orders, orders.o_orderkey == big_orders.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("odate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


LARGE_VOLUME_CUSTOMERS_SQL = f"""
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_orderdate AS DATE)::VARCHAR AS odate,
       o.o_totalprice, t.sum_qty
FROM orders o
JOIN (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {Q18_MIN_QTY}
) t ON o.o_orderkey = t.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 100
"""


# testdata brands run Brand#1..Brand#25 (no Brand#34)
Q19_BRANCHES = [
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#21", 1, 15, 20, 30),
]


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue from an OR of three (brand, size-range,
    quantity-range) conjunctions — predicates straddle the join.

    Part-only conjuncts (brand OR-ed, size ≤ max of all branches) are
    implied by the disjunction and prune the broadcast build side; the
    full OR evaluates as the join residual.  Single-row output, map-side
    partial aggregation."""
    branches = Q19_BRANCHES
    part = read_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .withColumn("net_sales", net_sales())
        .select("l_partkey", "l_quantity", "net_sales")
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    cond = None
    for brand, smin, smax, qmin, qmax in branches:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(smin, smax)
            & F.col("l_quantity").between(qmin, qmax)
        )
        cond = c if cond is None else (cond | c)
    return joined.filter(cond).agg(
        stable_sum("net_sales").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def _q19_branch_sql(b: tuple) -> str:
    brand, smin, smax, qmin, qmax = b
    return (
        f"(p.p_brand = '{brand}' AND p.p_size BETWEEN {smin} AND {smax}"
        f" AND l.l_quantity BETWEEN {qmin} AND {qmax})"
    )


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE {' OR '.join(_q19_branch_sql(b) for b in Q19_BRANCHES)}
"""


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on a finished
    multi-supplier order ("late" = shipped > {Q21_LATE_DAYS} days after
    the order date).

    One (orderkey, suppkey, any_late) frame — order-level supplier
    states — feeds both probes: EXISTS(another supplier) is a semi join,
    NOT EXISTS(another LATE supplier) an anti join, both equi on
    orderkey with a suppkey≠ residual.  lineitem shuffles on orderkey
    once for the state build; the probes join order-grained (pre-shrunk)
    frames.  Top-{Q21_TOP_N} is a TakeOrderedAndProject."""
    orders_f = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lines = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey).withColumn(
        "is_late",
        (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAYS")
        ).cast("int"),
    )
    # order-level supplier state: one row per (order, supplier)
    supp_state = lines.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("any_late")
    )
    late = supp_state.filter(F.col("any_late") == 1).select(
        F.col("l_orderkey").alias("w_orderkey"),
        F.col("l_suppkey").alias("w_suppkey"),
    )
    others = supp_state.select(
        F.col("l_orderkey").alias("o_orderkey2"),
        F.col("l_suppkey").alias("o_suppkey2"),
        "any_late",
    )
    waiting = (
        late.join(
            others,
            (late.w_orderkey == others.o_orderkey2)
            & (late.w_suppkey != others.o_suppkey2),
            "left_semi",
        )
        .join(
            others.filter(F.col("any_late") == 1),
            (late.w_orderkey == others.o_orderkey2)
            & (late.w_suppkey != others.o_suppkey2),
            "left_anti",
        )
    )
    supp = read_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waiting.join(supp, waiting.w_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(Q21_TOP_N)
    )


WAITING_SUPPLIERS_SQL = f"""
WITH lines AS (
  SELECT l.l_orderkey, l.l_suppkey,
         CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {Q21_LATE_DAYS} DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), supp_state AS (
  SELECT l_orderkey, l_suppkey, MAX(is_late) AS any_late
  FROM lines GROUP BY l_orderkey, l_suppkey
)
SELECT s.s_name, COUNT(*) AS numwait
FROM supp_state w
JOIN supplier s ON w.l_suppkey = s.s_suppkey
WHERE w.any_late = 1
  AND EXISTS (SELECT 1 FROM supp_state x
              WHERE x.l_orderkey = w.l_orderkey
                AND x.l_suppkey <> w.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM supp_state y
                  WHERE y.l_orderkey = w.l_orderkey
                    AND y.l_suppkey <> w.l_suppkey
                    AND y.any_late = 1)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name ASC
LIMIT {Q21_TOP_N}
"""


Q6_YEAR_START = "1996-01-01"
Q6_YEAR_END = "1997-01-01"


def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: revenue delta from hypothetically eliminating discounts
    in a band — a pure single-table filtered aggregate.

    The whole query is scan → pushed filters → map-side partial sum; the
    plan's value is what it does NOT contain: no join, no wide shuffle,
    and all three predicates (date range, discount band, quantity cap)
    land in the parquet scan's PushedFilters."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit(Q6_YEAR_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(Q6_YEAR_END).cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_sum(
                F.col("l_extendedprice") * F.col("l_discount")
            ).alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


FORECAST_REVENUE_CHANGE_SQL = f"""
SELECT {oracle_sum('l_extendedprice * l_discount')} AS revenue_delta,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR_START} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{Q6_YEAR_END} 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


Q9_NAME_FRAGMENT = "red"
Q9_COST_FACTOR = 0.6  # stand-in supply cost: 60% of part retail price


def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (adapted): profit on '%{Q9_NAME_FRAGMENT}%' parts by
    supplier nation and ship year.  The testdata has no partsupp, so
    supply cost is modeled as {Q9_COST_FACTOR}·p_retailprice·quantity —
    the join topology (LIKE-filtered part ⋈ lineitem ⋈ supplier ⋈
    nation, fact agg by (nation, year)) is the point.

    The LIKE filter prunes the broadcast part build side before the fact
    join; profit arithmetic stays on the 4-decimal grid (prices
    2-decimal, discount 2-decimal) so the grid-rounded sum is exact."""
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like(f"%{Q9_NAME_FRAGMENT}%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_shipdate",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
    )
    profit = F.col("l_extendedprice") * (1.0 - F.col("l_discount")) - F.lit(
        Q9_COST_FACTOR
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("l_shipdate").cast("int").alias("ship_year")
        )
        .agg(stable_sum(profit).alias("profit"))
    )


PRODUCT_TYPE_PROFIT_SQL = f"""
SELECT n.n_name,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
       {oracle_sum(f'l.l_extendedprice * (1.0 - l.l_discount) - {Q9_COST_FACTOR} * p.p_retailprice * l.l_quantity')} AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%{Q9_NAME_FRAGMENT}%'
GROUP BY n.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT)
"""


Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"


def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between two nations by (supplier nation,
    customer nation, year) — the symmetric pair predicate
    ``(n1=A AND n2=B) OR (n1=B AND n2=A)``.

    Both nation lookups broadcast; the pair disjunction is evaluated on
    broadcast-joined columns (never a cross product), and the year comes
    from the shipdate so the groupBy stays fact-partitioned.  One big
    shuffle: lineitem ⋈ orders on orderkey; the final (nation, nation,
    year) aggregate is dimension-sized."""
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    pair = [Q7_NATION_A, Q7_NATION_B]
    supp = (
        read_table(spark, sf_dir, "supplier")
        .join(
            nation.filter(F.col("n_name").isin(pair)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        read_table(spark, sf_dir, "customer")
        .join(
            nation.filter(F.col("n_name").isin(pair)),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = (
        read_table(spark, sf_dir, "lineitem")
        .withColumn("net_sales", net_sales())
        .select("l_orderkey", "l_suppkey", "l_shipdate", "net_sales")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == Q7_NATION_A)
                & (F.col("cust_nation") == Q7_NATION_B)
            )
            | (
                (F.col("supp_nation") == Q7_NATION_B)
                & (F.col("cust_nation") == Q7_NATION_A)
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(stable_sum("net_sales").alias("volume"))
    )


NATION_PAIR_VOLUME_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS volume
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{Q7_NATION_A}' AND n2.n_name = '{Q7_NATION_B}')
   OR (n1.n_name = '{Q7_NATION_B}' AND n2.n_name = '{Q7_NATION_A}')
GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT)
"""


def idle_wealthy_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: per market segment, customers with above-average
    account balance and no orders after {Q22_CUTOFF}.

    The average is a broadcast scalar (single-row crossJoin); the "no
    recent orders" clause is an anti join of customer against the
    date-filtered orders — at scale the anti side shrinks by the date
    predicate before the shuffle.  Balance sums are grid-rounded
    (acctbal sits on the 2-decimal grid) for oracle portability."""
    cust = read_table(spark, sf_dir, "customer", broadcast_dims=False).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        stable_avg("c_acctbal").alias(
            "avg_bal"
        )
    )
    recent_orders = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(Q22_CUTOFF).cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent_orders,
            cust.c_custkey == recent_orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            stable_sum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


IDLE_WEALTHY_CUSTOMERS_SQL = f"""
SELECT c.c_mktsegment, COUNT(*) AS numcust,
       {oracle_sum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_acctbal > (
        SELECT ROUND(ROUND(SUM(c_acctbal), 4) / COUNT(c_acctbal), 6)
        FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '{Q22_CUTOFF} 00:00:00')
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
"""


ORACLES: dict[str, str] = {
    "forecast_revenue_change": FORECAST_REVENUE_CHANGE_SQL,
    "product_type_profit": PRODUCT_TYPE_PROFIT_SQL,
    "order_count_distribution": ORDER_COUNT_DISTRIBUTION_SQL,
    "promo_revenue_share": PROMO_REVENUE_SHARE_SQL,
    "top_supplier": TOP_SUPPLIER_SQL,
    "large_volume_customers": LARGE_VOLUME_CUSTOMERS_SQL,
    "disjunctive_revenue": DISJUNCTIVE_REVENUE_SQL,
    "nation_pair_volume": NATION_PAIR_VOLUME_SQL,
    "waiting_suppliers": WAITING_SUPPLIERS_SQL,
    "idle_wealthy_customers": IDLE_WEALTHY_CUSTOMERS_SQL,
}

QUERIES = {
    "forecast_revenue_change": forecast_revenue_change,
    "product_type_profit": product_type_profit,
    "order_count_distribution": order_count_distribution,
    "promo_revenue_share": promo_revenue_share,
    "top_supplier": top_supplier,
    "large_volume_customers": large_volume_customers,
    "disjunctive_revenue": disjunctive_revenue,
    "nation_pair_volume": nation_pair_volume,
    "waiting_suppliers": waiting_suppliers,
    "idle_wealthy_customers": idle_wealthy_customers,
}
