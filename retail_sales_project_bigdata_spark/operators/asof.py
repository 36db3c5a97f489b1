"""As-of (temporal nearest-prior) join — a custom operator Spark lacks.

``asof_join`` matches every left row to the right row with the largest
timestamp ≤ the left timestamp within the same key — the kdb/Pandas
``merge_asof`` / DuckDB ``ASOF JOIN`` semantic.  Spark has no built-in;
the naive range-join + max rewrite explodes quadratically per key.

Spark-first shape (union-tag + running last_value): tag right rows 0 and
left rows 1, union them, and take ``last_value(right_cols, ignoreNulls)``
over a window ordered by (ts, tag) within the key — one shuffle on the
key, a per-key sort, zero row amplification.  That is exactly the merge
pass of a sort-merge as-of and scales as a single window aggregation
(AQE skew splitting covers hot keys).  Ties: a right row at the same ts
sorts BEFORE the left row (tag 0 < 1), so equal timestamps match —
DuckDB ASOF's ``>=`` semantic.

The concrete query joins each ``purchase`` event to the user's most
recent ``view`` (right side deduped to one row per (user, ts) by max
event_id, making tie-breaks engine-independent); the oracle is DuckDB's
NATIVE ``ASOF LEFT JOIN`` — two independent implementations of the
operator semantic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from retail_sales_project_bigdata_spark.sources import read_events


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
) -> DataFrame:
    """Generic as-of left join: left ⟕ most-recent right with
    ``right_ts <= left_ts`` per ``on`` key.  Returns all left columns
    plus ``right_cols`` (null when no prior right row exists).

    The right columns travel as ONE struct through the running
    ``last(ignorenulls)`` — filling them independently would splice
    values from different right rows whenever one right column is null
    (ASOF matches a *row*, atomically).  Right rows with a null timestamp
    are excluded up front: ``right_ts <= left_ts`` is null-false in ASOF
    semantics, but a null would sort FIRST under Spark's asc ordering and
    become a phantom earliest match."""
    on = list(on)
    # Null JOIN KEYS must not match: Window.partitionBy groups nulls into
    # one partition (null == null), but SQL/ASOF equality says a null key
    # matches nothing.  Dropping null-key RIGHT rows makes null-key left
    # rows fall through with null fills (left-join semantics preserved).
    right_nonnull = right.filter(F.col(right_ts).isNotNull())
    for k in on:
        right_nonnull = right_nonnull.filter(F.col(k).isNotNull())
    tagged_right = right_nonnull.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("__r"),
    )
    left_cols = [c for c in left.columns]
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(tagged_right.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    merged = tagged_left.unionByName(tagged_right, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "__tag",
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        F.last("__r", ignorenulls=True).over(w).alias("__r_filled"),
    )
    return (
        filled.filter(F.col("__tag") == 1)
        .select(
            *left_cols,
            *[F.col(f"__r_filled.{c}").alias(c) for c in right_cols],
        )
    )


def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase event joined as-of to the user's most recent view."""
    ev = read_events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", F.col("value").alias("purchase_value")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts_us").alias("view_ts_us"))
        .agg(
            F.max("event_id").alias("view_event_id"),
            F.max_by("value", "event_id").alias("view_value"),
        )
    )
    out = asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts_us",
        right_ts="view_ts_us",
        right_cols=["view_event_id", "view_ts_us", "view_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts_us",
        "purchase_value",
        F.coalesce("view_event_id", F.lit(-1)).alias("view_event_id"),
        F.coalesce("view_ts_us", F.lit(-1)).alias("view_ts_us"),
        F.coalesce("view_value", F.lit(-1.0)).alias("view_value"),
        F.coalesce(
            F.col("ts_us") - F.col("view_ts_us"), F.lit(-1)
        ).alias("gap_us"),
    )


ASOF_VIEW_BEFORE_PURCHASE_SQL = """
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type, value FROM events
),
purchases AS (
  SELECT event_id, user_id, ts_us, value AS purchase_value
  FROM ev WHERE event_type = 'purchase'
),
views AS (
  SELECT user_id, ts_us AS view_ts_us,
         MAX(event_id) AS view_event_id,
         max_by(value, event_id) AS view_value
  FROM ev WHERE event_type = 'view'
  GROUP BY user_id, ts_us
)
SELECT p.event_id, p.user_id, p.ts_us, p.purchase_value,
       COALESCE(v.view_event_id, -1) AS view_event_id,
       COALESCE(v.view_ts_us, -1) AS view_ts_us,
       COALESCE(v.view_value, -1.0) AS view_value,
       COALESCE(p.ts_us - v.view_ts_us, -1) AS gap_us
FROM purchases p
ASOF LEFT JOIN views v ON p.user_id = v.user_id AND p.ts_us >= v.view_ts_us
"""


ORACLES: dict[str, str] = {
    "asof_view_before_purchase": ASOF_VIEW_BEFORE_PURCHASE_SQL,
}

QUERIES = {
    "asof_view_before_purchase": asof_view_before_purchase,
}
