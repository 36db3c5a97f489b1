"""Data-governance operators: right-to-be-forgotten purge audit and
k-anonymity profiling.

A 100 TB corpus that feeds model training carries compliance duties the
reference's retail pipeline hints at but never implements (household
keys flow through every Dunnhumby table —
``FullPreprocessingPipeline.java:43-231`` joins them everywhere, which
is exactly the fan-out a GDPR Art. 17 erasure request has to chase).
These operators make the two canonical governance questions first-class
queries:

- :func:`gdpr_forget_audit` — given a deterministic forget-set of data
  subjects, how many rows in each table does the purge touch, directly
  or transitively (lineitem is reachable only THROUGH orders)?
- :func:`k_anonymity_profile` — are the quasi-identifier combinations in
  the customer dimension large enough that no individual is isolated
  (group size < k ⇒ re-identification risk)?

Scale design (100 TB):
- The forget-set is tiny relative to the corpus (erasure requests are
  per-person), so every direct-hit probe is a **broadcast** semi-join on
  the fact scan — no fact shuffle.  The one transitive step
  (orders → lineitem) joins on orderkey; the affected-orderkey set
  scales with the forget-set, not the corpus, so it broadcasts too
  (plain equi-join here, AQE flips it to broadcast when it fits; at a
  pathological forget-set size the shuffle join IS the right plan).
- The audit result is one row per table: four 1-row aggregates
  unioned — driver-sized output regardless of corpus size.
- k-anonymity is ONE partial+final hash aggregate over the dimension
  plus a 1-row broadcast total; group count is bounded by the QI
  domain, not the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.sources import read_table

# Deterministic forget-set rule: every data subject PRESENT IN THE EVENT
# LOG whose id ≡ 3 (mod 10) — the forget-set is drawn from ``events``
# only (the table an erasure handler actually receives ids from), so a
# customer matching the rule with zero event rows is out of scope of the
# audit by design.  A real deployment swaps this predicate for the
# erasure request table; the modulus keeps the testdata selective (~10%)
# at every scale factor.
FORGET_MOD = 10
FORGET_REMAINDER = 3

# Groups smaller than this are a re-identification risk (the standard
# k=5 disclosure-control floor).
K_ANON = 5
# Account-balance band width for the numeric quasi-identifier (TPC-H
# acctbal spans roughly [-1000, 10000]).
ACCTBAL_BAND = 2500.0


def _forget_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct data subjects matching the erasure rule, drawn from the
    event log (the table a request handler actually receives ids from)."""
    return (
        read_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % FORGET_MOD == FORGET_REMAINDER)
        .select(F.col("user_id").alias("subject_id"))
        .distinct()
    )


def gdpr_forget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table erasure impact: total rows, rows to purge, distinct
    subjects touched, and rows remaining after the purge.

    Direct hits (events, customer, orders) broadcast the forget-set onto
    each scan; the transitive hit (lineitem) goes through the affected
    orderkeys — the purge has to delete order lines whose ORDER belongs
    to a forgotten customer even though lineitem itself carries no
    customer key.  Each probe is computed as a conditional aggregate
    over a left-semi-flagged scan so the per-table result is one
    partial+final agg, then the four 1-row frames union into the audit.
    """
    forget = F.broadcast(_forget_set(spark, sf_dir))

    def _audit(df: DataFrame, key: str, table: str) -> DataFrame:
        flagged = df.join(
            forget, df[key] == forget.subject_id, "left"
        ).select(
            F.col(key).alias("_k"),
            F.col("subject_id").isNotNull().alias("_hit"),
        )
        return flagged.agg(
            F.lit(table).alias("table_name"),
            F.count(F.lit(1)).alias("rows_total"),
            F.sum(F.col("_hit").cast("long")).alias("rows_to_purge"),
            F.count_distinct(F.when(F.col("_hit"), F.col("_k"))).alias(
                "subjects"
            ),
            (
                F.count(F.lit(1)) - F.sum(F.col("_hit").cast("long"))
            ).alias("rows_after"),
        )

    events = read_table(spark, sf_dir, "events")
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")

    # Transitive reach: lineitem rows whose order belongs to a forgotten
    # customer.  The affected-order set is forget-set-sized → broadcast.
    hit_orders = orders.join(
        forget, orders.o_custkey == forget.subject_id, "left_semi"
    ).select("o_orderkey", "o_custkey")
    li_flagged = lineitem.join(
        F.broadcast(hit_orders),
        lineitem.l_orderkey == hit_orders.o_orderkey,
        "left",
    )
    li_audit = li_flagged.agg(
        F.lit("lineitem").alias("table_name"),
        F.count(F.lit(1)).alias("rows_total"),
        F.sum(F.col("o_orderkey").isNotNull().cast("long")).alias(
            "rows_to_purge"
        ),
        F.count_distinct("o_custkey").alias("subjects"),
        (
            F.count(F.lit(1))
            - F.sum(F.col("o_orderkey").isNotNull().cast("long"))
        ).alias("rows_after"),
    )

    return (
        _audit(events, "user_id", "events")
        .unionByName(_audit(customer, "c_custkey", "customer"))
        .unionByName(_audit(orders, "o_custkey", "orders"))
        .unionByName(li_audit)
    )


GDPR_FORGET_AUDIT_SQL = f"""
WITH forget AS (
  SELECT DISTINCT user_id AS subject_id FROM events
  WHERE user_id % {FORGET_MOD} = {FORGET_REMAINDER}
),
ev AS (
  SELECT 'events' AS table_name,
         CAST(COUNT(*) AS BIGINT) AS rows_total,
         CAST(SUM(CASE WHEN f.subject_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rows_to_purge,
         CAST(COUNT(DISTINCT CASE WHEN f.subject_id IS NOT NULL THEN e.user_id END) AS BIGINT) AS subjects,
         CAST(COUNT(*) - SUM(CASE WHEN f.subject_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS rows_after
  FROM events e LEFT JOIN forget f ON e.user_id = f.subject_id
),
cu AS (
  SELECT 'customer',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN f.subject_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN f.subject_id IS NOT NULL THEN c.c_custkey END) AS BIGINT),
         CAST(COUNT(*) - SUM(CASE WHEN f.subject_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM customer c LEFT JOIN forget f ON c.c_custkey = f.subject_id
),
orc AS (
  SELECT 'orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN f.subject_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT CASE WHEN f.subject_id IS NOT NULL THEN o.o_custkey END) AS BIGINT),
         CAST(COUNT(*) - SUM(CASE WHEN f.subject_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders o LEFT JOIN forget f ON o.o_custkey = f.subject_id
),
hit_orders AS (
  SELECT o.o_orderkey, o.o_custkey FROM orders o
  WHERE o.o_custkey IN (SELECT subject_id FROM forget)
),
li AS (
  SELECT 'lineitem',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN h.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT h.o_custkey) AS BIGINT),
         CAST(COUNT(*) - SUM(CASE WHEN h.o_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN hit_orders h ON l.l_orderkey = h.o_orderkey
)
SELECT * FROM ev UNION ALL SELECT * FROM cu
UNION ALL SELECT * FROM orc UNION ALL SELECT * FROM li
"""


def k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier tuple
    (nation, market segment, account-balance band): per-QI-group size,
    violation flag (group < k), and the group's share of all customers.

    One hash aggregate over the dimension + a 1-row broadcast total;
    the output is QI-domain-sized.  The share is a single IEEE divide —
    deterministic across engines, no rounding grid needed.
    """
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / ACCTBAL_BAND)
        .cast("long")
        .alias("acctbal_band"),
    )
    groups = cust.groupBy(
        "c_nationkey", "c_mktsegment", "acctbal_band"
    ).agg(F.count(F.lit(1)).alias("group_n"))
    total = cust.agg(F.count(F.lit(1)).alias("_total"))
    return (
        groups.crossJoin(F.broadcast(total))
        .select(
            "c_nationkey",
            "c_mktsegment",
            "acctbal_band",
            "group_n",
            (F.col("group_n") < K_ANON).cast("int").alias("violates_k"),
            (F.col("group_n").cast("double") / F.col("_total")).alias(
                "group_share"
            ),
        )
    )


K_ANONYMITY_PROFILE_SQL = f"""
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / {ACCTBAL_BAND}) AS BIGINT) AS acctbal_band
  FROM customer
),
groups AS (
  SELECT c_nationkey, c_mktsegment, acctbal_band,
         CAST(COUNT(*) AS BIGINT) AS group_n
  FROM cust GROUP BY c_nationkey, c_mktsegment, acctbal_band
)
SELECT c_nationkey, c_mktsegment, acctbal_band, group_n,
       CAST(group_n < {K_ANON} AS INT) AS violates_k,
       CAST(group_n AS DOUBLE) / (SELECT COUNT(*) FROM cust) AS group_share
FROM groups
"""


ORACLES: dict[str, str] = {
    "gdpr_forget_audit": GDPR_FORGET_AUDIT_SQL,
    "k_anonymity_profile": K_ANONYMITY_PROFILE_SQL,
}

QUERIES = {
    "gdpr_forget_audit": gdpr_forget_audit,
    "k_anonymity_profile": k_anonymity_profile,
}
