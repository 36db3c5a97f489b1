"""Change-data-capture primitives: snapshot diff and MERGE-style upsert.

Lakehouse write patterns expressed as plain DataFrame algebra (no Delta /
Iceberg dependency — ``sources.publish_versioned`` provides the
snapshot/manifest layer; these ops are the engine-side semantics):

- **snapshot_diff**: two versions of a keyed table → (key, status) with
  status ∈ {added, removed, changed}.  Full-outer join on the key,
  change detection by md5 over the canonicalized value columns — one
  shuffle, no row amplification, at 100 TB the hash comparison avoids
  shipping wide rows twice.
- **merge_upsert**: MERGE INTO semantics (matched → update, not matched
  by target → insert, else keep) via full-outer join + coalesce — the
  engine-level plan that a Delta MERGE compiles to.

Both versions here are *simulated* deterministically from the testdata
(there is only one physical snapshot), which keeps the ops oracle-exact:
the "old" snapshot drops every 10th order and the "new" one bumps every
7th order's price.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import DAY_EPOCH, pround
from retail_sales_project_bigdata_spark.sources import read_table


def _order_snapshots(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    old = orders.filter(F.col("o_orderkey") % 10 != 0)
    new = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, pround(F.col("o_totalprice") + 1.0, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    return old, new


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC diff of the simulated order snapshots: rows added in the new
    version, removed from it, or changed in any value column (detected
    via md5 over the canonicalized row — wide tables compare one hash,
    not every column, after the single key-shuffle)."""
    old, new = _order_snapshots(spark, sf_dir)

    def fingerprint(df: DataFrame) -> DataFrame:
        # Each column is null-coalesced to an explicit sentinel BEFORE
        # concatenation (concat_ws would silently SKIP nulls, making
        # ('a', null, 'b') collide with ('a', 'b') and diverging from the
        # oracle's null-propagating `||`; plain concat would null the
        # whole hash and misclassify the row as added/removed).  The
        # sentinel keeps null a distinct, hashable value in both engines.
        def canon(c: F.Column) -> F.Column:
            return F.coalesce(c.cast("string"), F.lit("<null>"))

        return df.select(
            "o_orderkey",
            F.md5(
                F.concat(
                    canon(F.col("o_custkey")),
                    F.lit("|"),
                    canon(F.col("o_orderstatus")),
                    F.lit("|"),
                    canon(
                        F.floor(F.col("o_totalprice") * 100 + 0.5).cast(
                            "long"
                        )
                    ),
                ).cast("binary")
            ).alias("row_hash"),
        )

    a = fingerprint(old).withColumnRenamed("row_hash", "old_hash")
    b = fingerprint(new).withColumnRenamed("row_hash", "new_hash")
    joined = a.join(b, "o_orderkey", "full_outer")
    return joined.select(
        "o_orderkey",
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .when(F.col("old_hash") != F.col("new_hash"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    ).filter(F.col("status") != "unchanged")


SNAPSHOT_DIFF_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
),
old AS (SELECT * FROM base WHERE o_orderkey % 10 <> 0),
new AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN ROUND(o_totalprice + 1.0, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM base
),
a AS (SELECT o_orderkey, md5(
          COALESCE(CAST(o_custkey AS VARCHAR), '<null>') || '|'
          || COALESCE(o_orderstatus, '<null>') || '|'
          || COALESCE(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '<null>')
      ) AS old_hash FROM old),
b AS (SELECT o_orderkey, md5(
          COALESCE(CAST(o_custkey AS VARCHAR), '<null>') || '|'
          || COALESCE(o_orderstatus, '<null>') || '|'
          || COALESCE(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), '<null>')
      ) AS new_hash FROM new)
SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN a.old_hash IS NULL THEN 'added'
            WHEN b.new_hash IS NULL THEN 'removed'
            WHEN a.old_hash <> b.new_hash THEN 'changed'
            ELSE 'unchanged' END AS status
FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
WHERE (CASE WHEN a.old_hash IS NULL THEN 'added'
            WHEN b.new_hash IS NULL THEN 'removed'
            WHEN a.old_hash <> b.new_hash THEN 'changed'
            ELSE 'unchanged' END) <> 'unchanged'
"""


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics: target = customers with c_custkey % 3 != 0
    (simulated stale table), source = per-customer order counts.  Matched
    targets get ``order_count`` updated; unmatched source keys are
    inserted with defaults; unmatched targets are kept (order_count 0).
    One full-outer join on the merge key — the shuffle MERGE compiles to
    when the source isn't broadcastable."""
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    target = customer.filter(F.col("c_custkey") % 3 != 0)
    source = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )
    merged = target.join(source, "c_custkey", "full_outer")
    return merged.select(
        "c_custkey",
        F.coalesce("c_name", F.lit("UNKNOWN")).alias("c_name"),
        F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("c_mktsegment"),
        F.coalesce("c_acctbal", F.lit(0.0)).alias("c_acctbal"),
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
        F.when(F.col("c_name").isNull(), "inserted")
        .when(F.col("order_count").isNull(), "kept")
        .otherwise("updated")
        .alias("merge_action"),
    )


MERGE_UPSERT_SQL = """
WITH target AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % 3 <> 0
),
source AS (
  SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS order_count
  FROM orders GROUP BY o_custkey
)
SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
       COALESCE(t.c_name, 'UNKNOWN') AS c_name,
       COALESCE(t.c_mktsegment, 'UNKNOWN') AS c_mktsegment,
       COALESCE(t.c_acctbal, 0.0) AS c_acctbal,
       COALESCE(s.order_count, 0) AS order_count,
       CASE WHEN t.c_name IS NULL THEN 'inserted'
            WHEN s.order_count IS NULL THEN 'kept'
            ELSE 'updated' END AS merge_action
FROM target t FULL OUTER JOIN source s ON t.c_custkey = s.c_custkey
"""


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-row-per-key — the CDC compaction every changelog
    consumer runs (row_number over a TOTAL order: date desc then
    orderkey desc, so reruns and engines agree on ties).  One shuffle on
    the key; at scale this is the standard dedup before a snapshot
    publish."""
    from pyspark.sql.window import Window

    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").cast("string").alias("odate"),
            "o_orderstatus",
            "o_totalprice",
        )
    )


LATEST_ORDER_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE)::VARCHAR AS odate,
       o_orderstatus, o_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_custkey
      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
"""


def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: turn a change feed into a
    versioned history with ``valid_from`` / ``valid_to`` / ``is_current``.

    The change feed here is each customer's order stream, with
    ``o_orderpriority`` as the tracked attribute.  Standard SCD2
    algebra, all window functions over ONE shuffle on the key:

    1. compact to DAY grain, last change wins (keep the max-orderkey row
       per (key, day) — validity is measured in whole days, so two
       same-day changes would otherwise mint an inverted
       ``valid_to = valid_from - 1`` version no lookup can ever match);
    2. drop consecutive duplicates with ``lag`` (only a VALUE CHANGE
       opens a new version — reprocessing an unchanged snapshot must not
       fork versions);
    3. close each version at the next version's start with ``lead``
       (``valid_to = next_from - 1``; open tail ⇒ NULL + is_current).

    At 100 TB this is the merge path of every dimension table fed by CDC;
    the alternative per-key sort on the driver is a non-starter.
    Reference analog: the reference keeps only latest-state dimensions
    (e.g. ``hh_demographic`` joins, ChurnPrediction.java:232-234) — SCD2
    is the history-preserving upgrade of that surface.
    """
    from pyspark.sql.window import Window

    from retail_sales_project_bigdata_spark.functions import day_index

    raw = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        day_index("o_orderdate").alias("day"),
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
    )
    wd = Window.partitionBy("o_custkey", "day").orderBy(
        F.desc("o_orderkey")
    )
    feed = (
        raw.withColumn("rn_day", F.row_number().over(wd))
        .filter(F.col("rn_day") == 1)
        .drop("rn_day")
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    changes = (
        feed.withColumn("prev_priority", F.lag("priority").over(w))
        .filter(
            F.col("prev_priority").isNull()
            | (F.col("priority") != F.col("prev_priority"))
        )
        .drop("prev_priority")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    return changes.select(
        "o_custkey",
        "priority",
        F.col("day").alias("valid_from"),
        (F.lead("day").over(w2) - 1).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.when(F.lead("day").over(w2).isNull(), 1).otherwise(0).alias(
            "is_current"
        ),
    )


SCD2_PRIORITY_HISTORY_SQL = f"""
WITH raw AS (
  SELECT o_custkey,
         CAST(datediff('day', DATE '{DAY_EPOCH}', CAST(o_orderdate AS DATE)) + 1
              AS INT) AS day,
         o_orderkey, o_orderpriority AS priority
  FROM orders
),
feed AS (
  SELECT o_custkey, day, o_orderkey, priority
  FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_custkey, day ORDER BY o_orderkey DESC) AS rn_day
    FROM raw
  )
  WHERE rn_day = 1
),
changes AS (
  SELECT o_custkey, day, o_orderkey, priority
  FROM (
    SELECT *, LAG(priority) OVER (
        PARTITION BY o_custkey ORDER BY day, o_orderkey) AS prev_priority
    FROM feed
  )
  WHERE prev_priority IS NULL OR priority <> prev_priority
)
SELECT o_custkey, priority,
       day AS valid_from,
       LEAD(day) OVER w - 1 AS valid_to,
       CAST(ROW_NUMBER() OVER w AS INT) AS version,
       CASE WHEN LEAD(day) OVER w IS NULL THEN 1 ELSE 0 END AS is_current
FROM changes
WINDOW w AS (PARTITION BY o_custkey ORDER BY day, o_orderkey)
"""


def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup — the consumer side of the SCD2
    build: each order resolves the priority VERSION that was valid on
    its order day (equi join on the key + a validity-range predicate,
    open current version matched via NULL ``valid_to``).

    The fact keeps exactly one match by construction (versions partition
    each key's timeline — guaranteed by the day-grain last-change-wins
    compaction in the SCD2 build), so there is no row amplification.
    Physical shape: one shuffle on the key for the history build, then
    an equi join on the key with the range predicate evaluated
    post-match — at 100 TB the history side is dimension-sized and
    broadcasts.  ``self_consistent`` is 1 when the order carries the
    priority its day's version records; same-day transient changes that
    day-grain SCD2 deliberately collapses (an earlier order superseded
    the same day) read the day's final version and flag 0.
    """
    from retail_sales_project_bigdata_spark.functions import day_index

    hist = scd2_priority_history(spark, sf_dir)
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        day_index("o_orderdate").alias("order_day"),
        F.col("o_orderpriority").alias("actual_priority"),
    )
    joined = orders.join(
        hist,
        (orders.o_custkey == hist.o_custkey)
        & (F.col("order_day") >= F.col("valid_from"))
        & (
            F.col("valid_to").isNull()
            | (F.col("order_day") <= F.col("valid_to"))
        ),
    )
    return joined.select(
        "o_orderkey",
        orders.o_custkey.alias("custkey"),
        "order_day",
        F.col("priority").alias("pit_priority"),
        "version",
        (F.col("priority") == F.col("actual_priority")).cast("int").alias(
            "self_consistent"
        ),
    )


SCD2_POINT_IN_TIME_LOOKUP_SQL = f"""
WITH hist AS ({SCD2_PRIORITY_HISTORY_SQL}),
ord AS (
  SELECT o_orderkey, o_custkey,
         CAST(datediff('day', DATE '{DAY_EPOCH}', CAST(o_orderdate AS DATE)) + 1
              AS INT) AS order_day,
         o_orderpriority AS actual_priority
  FROM orders
)
SELECT o.o_orderkey, o.o_custkey AS custkey, o.order_day,
       h.priority AS pit_priority, h.version,
       CAST(h.priority = o.actual_priority AS INT) AS self_consistent
FROM ord o JOIN hist h
  ON o.o_custkey = h.o_custkey
 AND o.order_day >= h.valid_from
 AND (h.valid_to IS NULL OR o.order_day <= h.valid_to)
"""


ORACLES: dict[str, str] = {
    "snapshot_diff": SNAPSHOT_DIFF_SQL,
    "merge_upsert": MERGE_UPSERT_SQL,
    "latest_order_per_customer": LATEST_ORDER_PER_CUSTOMER_SQL,
    "scd2_priority_history": SCD2_PRIORITY_HISTORY_SQL,
    "scd2_point_in_time_lookup": SCD2_POINT_IN_TIME_LOOKUP_SQL,
}

QUERIES = {
    "snapshot_diff": snapshot_diff,
    "merge_upsert": merge_upsert,
    "latest_order_per_customer": latest_order_per_customer,
    "scd2_priority_history": scd2_priority_history,
    "scd2_point_in_time_lookup": scd2_point_in_time_lookup,
}
