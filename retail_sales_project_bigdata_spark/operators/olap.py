"""Extended OLAP surface (SURVEY §2.7/§7.5 — absent from the reference,
"the rebuild gets them for free"): cube/rollup, pivot, semi/anti joins,
exact percentiles, and the SQL-API entry path.  Oracle-checked except
the three approximate/sketch queries (percentile_approx, freqItems,
HLL rollup), which are property-tested against their exact anchors —
see the ORACLES note at the bottom.

Scale notes: cube/rollup compile to Catalyst's Expand (one shuffle, k×
row expansion where k = #grouping sets) — fine when the grouping keys are
low-cardinality as here; semi/anti joins broadcast their right side when
it is a dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import net_sales, oracle_sum, stable_sum, pround
from retail_sales_project_bigdata_spark.sources import read_table


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping sets in one pass."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("net_sales", net_sales())
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            stable_sum("net_sales").alias("revenue"),
        )
    )


CUBE_SALES_SQL = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def rollup_region_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over the region → nation hierarchy."""
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
        .rollup("r_name", "n_name")
        .agg(stable_sum("net_sales").alias("revenue"))
    )


ROLLUP_REGION_SALES_SQL = f"""
SELECT r.r_name, n.n_name,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
"""


def pivot_status_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list — never pivot on
    unbounded distinct values at scale)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(pround(F.sum("l_quantity"), 4).alias("qty"))
        .withColumnRenamed("O", "O_qty")
        .withColumnRenamed("F", "F_qty")
    )


PIVOT_STATUS_QTY_SQL = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O_qty,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F_qty
FROM lineitem GROUP BY l_returnflag
"""


def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — customers that have at least one order."""
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


CUSTOMERS_WITH_ORDERS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS) — parts that never appear in lineitem."""
    part = read_table(spark, sf_dir, "part")
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name", "p_brand"
    )


PARTS_NEVER_ORDERED_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per brand (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear interpolation).  At 100 TB use
    ``approx_percentile`` (t-digest) — provided as the rows-only variant."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = li.join(part, li.l_partkey == part.p_partkey)
    return joined.groupBy("p_brand").agg(
        pround(F.percentile("l_extendedprice", 0.25), 4).alias("p25"),
        pround(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
        pround(F.percentile("l_extendedprice", 0.75), 4).alias("p75"),
        pround(F.min("l_extendedprice"), 4).alias("pmin"),
        pround(F.max("l_extendedprice"), 4).alias("pmax"),
    )


PRICE_PERCENTILES_SQL = """
SELECT p.p_brand,
       ROUND(quantile_cont(l.l_extendedprice, 0.25), 4) AS p25,
       ROUND(quantile_cont(l.l_extendedprice, 0.50), 4) AS p50,
       ROUND(quantile_cont(l.l_extendedprice, 0.75), 4) AS p75,
       ROUND(MIN(l.l_extendedprice), 4) AS pmin,
       ROUND(MAX(l.l_extendedprice), 4) AS pmax
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


def price_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles — the scale path (single-pass sketch,
    mergeable across partitions).  Rows-only by design."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_percentile("l_extendedprice", 0.5, 10000).alias("p50_approx"),
        F.approx_count_distinct("l_partkey").alias("nd_parts_approx"),
    )


def sql_api_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-API entry path (SURVEY §2.12): register temp views, run a
    textual query — Catalyst produces the same plan as the DataFrame API."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o.o_orderpriority,
               COUNT(DISTINCT o.o_orderkey) AS n_orders,
               ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue
        FROM v_lineitem l JOIN v_orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        """
    )


SQL_API_REVENUE_BY_PRIORITY_SQL = """
SELECT o.o_orderpriority,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       ROUND(SUM(l.l_extendedprice * (1.0 - l.l_discount)), 4) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


HEAVY_HITTER_K = 1500  # heavy hitter := item with > 1/K of all rows


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: parts carrying more than 1/K of lineitem rows.

    The threshold compare is PURE INTEGER (``n*K > total``) — no float
    tie can disagree between engines.  The global total rides in as a
    broadcast 1-row cross join (no driver action, no second scan of the
    base table — the per-key counts re-aggregate to the total).

    Scale: one shuffle for the per-key counts (map-side partials make
    the shuffle ~|keys|); the total is a tiny all-reduce of those
    counts.  The approximate twin (``heavy_hitters_approx``) is the
    single-pass sketch path for when even |keys| is too large.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey")
    counts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") * HEAVY_HITTER_K > F.col("total"))
        .select("l_partkey", "n")
    )


HEAVY_HITTERS_SQL = f"""
SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_partkey
HAVING COUNT(*) * {HEAVY_HITTER_K} > (SELECT COUNT(*) FROM lineitem)
"""


def heavy_hitters_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass approximate heavy hitters (``DataFrame.stat.freqItems``,
    Karp-Papadimitriou-Shenker): guaranteed SUPERSET of the exact > 1/K
    items without the per-key aggregation — the first-pass filter at
    100 TB, re-counted exactly only for the candidate set.  Rows-only by
    design (false positives are part of the contract); the superset
    guarantee is property-tested against ``heavy_hitters``."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey")
    freq = li.stat.freqItems(["l_partkey"], support=1.0 / HEAVY_HITTER_K)
    return freq.select(
        F.explode("l_partkey_freqItems").alias("l_partkey")
    ).orderBy("l_partkey")


def distinct_parts_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    ``hll_sketch_agg`` / ``hll_union_agg``): per-returnflag sketches of
    distinct parts, re-MERGED into the global estimate WITHOUT touching
    the base table again.

    This is the 100 TB pre-aggregation pattern ``approx_count_distinct``
    alone cannot express: materialize a sketch per cube cell once, then
    answer any coarser grouping by unioning cell sketches — a second
    full scan becomes a |cells|-row merge.  Rows-only by design
    (estimates); accuracy and merge-associativity are property-tested.
    """
    li = read_table(spark, sf_dir, "lineitem")
    per_flag = li.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    merged = per_flag.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("nd_parts_est"),
        F.sum("n_rows").alias("n_rows"),
    ).select(F.lit("ALL").alias("l_returnflag"), "nd_parts_est", "n_rows")
    per_flag_est = per_flag.select(
        "l_returnflag",
        F.hll_sketch_estimate("sk").alias("nd_parts_est"),
        "n_rows",
    )
    return per_flag_est.unionByName(merged)


HIST_BUCKET_WIDTH = 5000.0  # covers l_extendedprice ∈ [~900, ~105000]


def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of extended price: bucket assignment is one
    IEEE double divide + floor (bit-identical across engines — Spark's
    ``width_bucket`` is avoided only because DuckDB lacks it, the
    arithmetic is the same), then an ordinary count/min/max rollup.

    Scale: histogramming is the map-side-combine ideal — ~22 groups
    regardless of input size, so the shuffle carries one row per
    (partition, bucket)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    w = F.lit(HIST_BUCKET_WIDTH)
    return (
        li.withColumn(
            "bucket", F.floor(F.col("l_extendedprice") / w).cast("int")
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
        )
        .withColumn("bucket_start", F.col("bucket") * w)
    )


PRICE_HISTOGRAM_SQL = f"""
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(l_extendedprice) AS lo,
       MAX(l_extendedprice) AS hi,
       bucket * {HIST_BUCKET_WIDTH} AS bucket_start
FROM (SELECT l_extendedprice,
             CAST(FLOOR(l_extendedprice / {HIST_BUCKET_WIDTH}) AS INT) AS bucket
      FROM lineitem)
GROUP BY bucket
"""


def status_qty_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``unpivot`` (melt) — the inverse of ``pivot_status_qty``:
    wide per-status columns back to (flag, status, qty) rows.  Runs on
    the 3-row pivot output, so the operator cost is nil at any scale;
    the point is the API surface and its null semantics (Spark keeps
    null cells — mirrored by the UNION ALL oracle)."""
    wide = pivot_status_qty(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["O_qty", "F_qty"],
        variableColumnName="status_col",
        valueColumnName="qty",
    )


STATUS_QTY_UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O_qty,
         ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F_qty
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'O_qty' AS status_col, O_qty AS qty FROM wide
UNION ALL
SELECT l_returnflag, 'F_qty' AS status_col, F_qty AS qty FROM wide
"""


LATE_SHIP_DAYS = 90


def late_shipment_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having AT LEAST ONE lineitem shipped more
    than {LATE_SHIP_DAYS} days after the order date, counted by priority
    — the correlated EXISTS, expressed as a left-semi join whose
    condition carries the correlated predicate (Catalyst's own
    decorrelation target shape: one shuffle on orderkey, no row
    amplification from multi-lineitem orders)."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (
            li.l_shipdate
            > orders.o_orderdate + F.expr(f"INTERVAL {LATE_SHIP_DAYS} DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_late_orders")
    )


LATE_SHIPMENT_PRIORITY_COUNTS_SQL = f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
)
GROUP BY o.o_orderpriority
"""


SMALL_QTY_FRACTION = 0.5


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    {SMALL_QTY_FRACTION}× their part's average quantity — the correlated
    scalar (per-group average) subquery, decorrelated into an aggregate
    + self-join on partkey.

    Determinism: quantities are integral, so each per-part sum is an
    exact double and avg = sum/n is the identical IEEE division on both
    engines — the ``q < f·avg`` membership test can't flip.  Scale: both
    sides shuffle once on partkey; AQE merges the post-agg side."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part_avg = li.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < SMALL_QTY_FRACTION * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            stable_sum("l_extendedprice").alias("small_qty_revenue"),
        )
    )


SMALL_QUANTITY_REVENUE_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_small,
       {oracle_sum('l.l_extendedprice')} AS small_qty_revenue
FROM lineitem l
JOIN (SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) pa
  ON l.l_partkey = pa.l_partkey
WHERE l.l_quantity < {SMALL_QTY_FRACTION} * pa.avg_qty
"""


def grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((flag), (status), ()) with a grouping-id
    bitmask — the general form cube/rollup specialize.  One Expand +
    one shuffle regardless of how many sets are requested."""
    li = read_table(spark, sf_dir, "lineitem").withColumn(
        "net_sales", net_sales()
    )
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            stable_sum("net_sales").alias("revenue"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n_rows", "revenue")
    )


GROUPING_SETS_SALES_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_rows,
       {oracle_sum('l_extendedprice * (1.0 - l_discount)')} AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def null_semantics_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-semantics surface in one oracle-checked query: COUNT(*) vs
    COUNT(col) vs COUNT(DISTINCT col) on a nullable column, null-ignoring
    MIN/MAX, an explicit IS NULL conditional count, and a NULL-SAFE
    equality join (Spark ``eqNullSafe`` ↔ SQL ``IS NOT DISTINCT FROM``,
    where NULL matches NULL).

    The testdata has no physical nulls, so the nullable column is derived
    (``NULLIF(l_discount, 0)``) — identically in both engines.  Scale:
    one fact shuffle for the per-flag aggregate; the null-safe join runs
    on the distinct (flag, value) frame, dimension-sized."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.expr("NULLIF(l_discount, 0.0)").alias("d")
    )
    per_flag = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("d").alias("n_nonnull"),
        F.countDistinct("d").alias("n_distinct"),
        F.sum(F.when(F.col("d").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    )
    vals = li.distinct()
    a = vals.filter(F.col("l_returnflag") == "R").select(
        F.col("d").alias("d_a")
    )
    b = vals.filter(F.col("l_returnflag") == "A").select(
        F.col("d").alias("d_b")
    )
    ns = a.join(b, F.col("d_a").eqNullSafe(F.col("d_b"))).agg(
        F.count(F.lit(1)).alias("nullsafe_pairs")
    )
    return per_flag.crossJoin(F.broadcast(ns))


def part_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.7 set operations as first-class queries: the parts sold on
    weekends INTERSECT / EXCEPT the parts sold on weekdays.

    Both inputs are distinct key sets (dimension-sized after the
    DISTINCT), so INTERSECT/EXCEPT compile to hash semi/anti joins on
    pre-shrunk frames — the fact table is scanned twice but aggregated
    before any set op.  Spark ``dayofweek`` is 1=Sunday..7=Saturday;
    the oracle's ``EXTRACT(dow)`` is 0=Sunday..6 — both derive weekend
    from the same dates."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.dayofweek("l_shipdate").alias("dow")
    )
    weekend = li.filter(F.col("dow").isin(1, 7)).select("l_partkey").distinct()
    weekday = (
        li.filter(~F.col("dow").isin(1, 7)).select("l_partkey").distinct()
    )
    return (
        weekend.intersect(weekday)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("both").alias("channel"), "n")
        .unionByName(
            weekend.exceptAll(weekday)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("weekend_only").alias("channel"), "n")
        )
        .unionByName(
            weekday.exceptAll(weekend)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit("weekday_only").alias("channel"), "n")
        )
    )


PART_CHANNEL_OVERLAP_SQL = """
WITH weekend AS (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE EXTRACT(dow FROM l_shipdate) IN (0, 6)
),
weekday AS (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE EXTRACT(dow FROM l_shipdate) NOT IN (0, 6)
)
SELECT 'both' AS channel,
       (SELECT COUNT(*) FROM (SELECT * FROM weekend INTERSECT SELECT * FROM weekday)) AS n
UNION ALL
SELECT 'weekend_only',
       (SELECT COUNT(*) FROM (SELECT * FROM weekend EXCEPT SELECT * FROM weekday))
UNION ALL
SELECT 'weekday_only',
       (SELECT COUNT(*) FROM (SELECT * FROM weekday EXCEPT SELECT * FROM weekend))
"""


NULL_SEMANTICS_PROBE_SQL = """
WITH base AS (
  SELECT l_returnflag, NULLIF(l_discount, 0.0) AS d FROM lineitem
),
per_flag AS (
  SELECT l_returnflag,
         COUNT(*) AS n_rows,
         COUNT(d) AS n_nonnull,
         COUNT(DISTINCT d) AS n_distinct,
         CAST(SUM(CASE WHEN d IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         MIN(d) AS min_d,
         MAX(d) AS max_d
  FROM base GROUP BY l_returnflag
),
vals AS (SELECT DISTINCT l_returnflag, d FROM base),
ns AS (
  SELECT COUNT(*) AS nullsafe_pairs
  FROM (SELECT d FROM vals WHERE l_returnflag = 'R') a
  JOIN (SELECT d FROM vals WHERE l_returnflag = 'A') b
    ON a.d IS NOT DISTINCT FROM b.d
)
SELECT p.*, ns.nullsafe_pairs FROM per_flag p CROSS JOIN ns
"""


def dq_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: orphan counts for every foreign-key edge of the
    star schema (lineitem→orders/part/supplier, orders→customer,
    customer/supplier→nation, nation→region), one row per edge.

    Each check is a LEFT ANTI join (fact side) against the referenced key
    set — dims broadcast, the two fact-fact checks shuffle once each on
    the join key.  The union of single-row aggregates is a driver-cheap
    plan: each branch reduces before the union.  The expected result on
    healthy testdata is all zeros — the point of the query is the shape
    (the 100 TB ingest-validation pass), and the oracle proves each anti
    join's count, not just emptiness."""
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    part = read_table(spark, sf_dir, "part")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")

    def orphans(name, child, child_key, parent, parent_key):
        return (
            child.select(F.col(child_key).alias("k"))
            .join(
                parent.select(F.col(parent_key).alias("k")),
                "k",
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n_orphans"))
            .select(F.lit(name).alias("fk_edge"), "n_orphans")
        )

    checks = [
        orphans("lineitem->orders", li, "l_orderkey", orders, "o_orderkey"),
        orphans("lineitem->part", li, "l_partkey", part, "p_partkey"),
        orphans("lineitem->supplier", li, "l_suppkey", supp, "s_suppkey"),
        orphans("orders->customer", orders, "o_custkey", cust, "c_custkey"),
        orphans("customer->nation", cust, "c_nationkey", nation, "n_nationkey"),
        orphans("supplier->nation", supp, "s_nationkey", nation, "n_nationkey"),
        orphans("nation->region", nation, "n_regionkey", region, "r_regionkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


DQ_REFERENTIAL_AUDIT_SQL = """
SELECT 'lineitem->orders' AS fk_edge,
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
UNION ALL
SELECT 'lineitem->supplier',
       (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
          (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey))
UNION ALL
SELECT 'orders->customer',
       (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
          (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'customer->nation',
       (SELECT COUNT(*) FROM customer c WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey))
UNION ALL
SELECT 'supplier->nation',
       (SELECT COUNT(*) FROM supplier s WHERE NOT EXISTS
          (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey))
UNION ALL
SELECT 'nation->region',
       (SELECT COUNT(*) FROM nation n WHERE NOT EXISTS
          (SELECT 1 FROM region r WHERE r.r_regionkey = n.n_regionkey))
"""


ORACLES: dict[str, str] = {
    "null_semantics_probe": NULL_SEMANTICS_PROBE_SQL,
    "part_channel_overlap": PART_CHANNEL_OVERLAP_SQL,
    "dq_referential_audit": DQ_REFERENTIAL_AUDIT_SQL,
    "cube_sales": CUBE_SALES_SQL,
    "rollup_region_sales": ROLLUP_REGION_SALES_SQL,
    "pivot_status_qty": PIVOT_STATUS_QTY_SQL,
    "customers_with_orders": CUSTOMERS_WITH_ORDERS_SQL,
    "parts_never_ordered": PARTS_NEVER_ORDERED_SQL,
    "price_percentiles": PRICE_PERCENTILES_SQL,
    "sql_api_revenue_by_priority": SQL_API_REVENUE_BY_PRIORITY_SQL,
    "heavy_hitters": HEAVY_HITTERS_SQL,
    "price_histogram": PRICE_HISTOGRAM_SQL,
    "status_qty_unpivot": STATUS_QTY_UNPIVOT_SQL,
    "late_shipment_priority_counts": LATE_SHIPMENT_PRIORITY_COUNTS_SQL,
    "small_quantity_revenue": SMALL_QUANTITY_REVENUE_SQL,
    "grouping_sets_sales": GROUPING_SETS_SALES_SQL,
    # price_percentiles_approx / heavy_hitters_approx /
    # distinct_parts_sketch_rollup: rows-only (sketch-based by design)
}

QUERIES = {
    "null_semantics_probe": null_semantics_probe,
    "part_channel_overlap": part_channel_overlap,
    "dq_referential_audit": dq_referential_audit,
    "cube_sales": cube_sales,
    "rollup_region_sales": rollup_region_sales,
    "pivot_status_qty": pivot_status_qty,
    "customers_with_orders": customers_with_orders,
    "parts_never_ordered": parts_never_ordered,
    "price_percentiles": price_percentiles,
    "price_percentiles_approx": price_percentiles_approx,
    "sql_api_revenue_by_priority": sql_api_revenue_by_priority,
    "heavy_hitters": heavy_hitters,
    "heavy_hitters_approx": heavy_hitters_approx,
    "distinct_parts_sketch_rollup": distinct_parts_sketch_rollup,
    "price_histogram": price_histogram,
    "status_qty_unpivot": status_qty_unpivot,
    "late_shipment_priority_counts": late_shipment_priority_counts,
    "small_quantity_revenue": small_quantity_revenue,
    "grouping_sets_sales": grouping_sets_sales,
}
