"""Skew-mitigation utilities (SURVEY §4.2 / guide: "skewed keys → salting
or AQE skew-join").

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these utilities are the *manual* techniques for when the
skew is in an aggregation (AQE can't split a hash-aggregate group) or a
deliberate physical design is wanted:

- ``salted_aggregate``: two-phase aggregation — partial per (key, salt),
  final per key.  The hot key's rows spread over N salt partitions in
  phase 1, so no single task owns the whole key.
- ``salted_join``: replicate the small side N× (one copy per salt), salt
  the big side randomly — the hot key's join work spreads over N tasks.

Both are semantics-preserving (property-tested against unsalted plans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.sources import read_table

DEFAULT_SALTS = 8

_PROFILE_KEYS = ["l_orderkey", "l_partkey", "l_suppkey"]


def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostics for the fact table's join keys — the numbers that
    decide whether a join needs salting / AQE skew splitting BEFORE it
    runs at scale: distinct key count, max and mean per-key row count,
    the hottest key's share of all rows, and the max/mean skew ratio.

    One groupBy per profiled key (each a partial+final hash agg over one
    column) and a 3-row union — this is the cheap pre-flight a pipeline
    runs against a sample or footer statistics, not a per-query cost.
    All measures derive from integer counts, so the ratios are exact
    IEEE divisions on both engines.
    """
    li = read_table(spark, sf_dir, "lineitem")
    profiles = []
    for key in _PROFILE_KEYS:
        counts = li.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        profiles.append(
            counts.agg(
                F.lit(key).alias("join_key"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("cnt").alias("n_rows"),
                F.max("cnt").alias("max_per_key"),
                (
                    F.sum("cnt").cast("double") / F.count(F.lit(1))
                ).alias("mean_per_key"),
                (F.max("cnt").cast("double") / F.sum("cnt")).alias(
                    "top1_share"
                ),
                (
                    F.max("cnt")
                    * F.count(F.lit(1)).cast("double")
                    / F.sum("cnt")
                ).alias("skew_ratio"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


def _skew_profile_sql(key: str) -> str:
    return f"""
SELECT '{key}' AS join_key,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       MAX(cnt) AS max_per_key,
       CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS mean_per_key,
       CAST(MAX(cnt) AS DOUBLE) / SUM(cnt) AS top1_share,
       MAX(cnt) * CAST(COUNT(*) AS DOUBLE) / SUM(cnt) AS skew_ratio
FROM (SELECT {key}, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY {key})"""


JOIN_KEY_SKEW_PROFILE_SQL = "\nUNION ALL\n".join(
    _skew_profile_sql(k) for k in _PROFILE_KEYS
)

def salted_user_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity rollup computed THROUGH ``salted_aggregate`` —
    the two-phase (key, salt)→key aggregation surfaced as an
    oracle-checked gate entry, proving the salted plan is
    semantics-preserving end-to-end (the gate compares it against the
    plain single-phase GROUP BY in DuckDB).

    Only order-insensitive exact aggregates go through the salted path
    (count, min, max on exact int64 µs timestamps): splitting a double
    SUM across salt partitions would change IEEE addition order, which
    is exactly the nondeterminism the stable_sum discipline exists to
    prevent — a salted float sum is rows-only territory by construction,
    so this entry deliberately sticks to the decomposable-exact subset.

    Scale: the hot user's rows spread over {DEFAULT_SALTS} salt groups
    in phase 1; phase 2 merges |users|×{DEFAULT_SALTS} partials — no
    single task ever owns a hot key's full row set.
    """
    from retail_sales_project_bigdata_spark.sources import read_events

    ev = read_events(spark, sf_dir).select("user_id", "event_id", "ts_us")
    out = salted_aggregate(
        ev,
        ["user_id"],
        {
            "n_events": ("event_id", "count"),
            "first_ts_us": ("ts_us", "min"),
            "last_ts_us": ("ts_us", "max"),
        },
    )
    return out.select(
        "user_id",
        F.col("n_events").cast("long").alias("n_events"),
        "first_ts_us",
        "last_ts_us",
    )


SALTED_USER_EVENT_COUNTS_SQL = """
SELECT user_id,
       CAST(COUNT(event_id) AS BIGINT) AS n_events,
       MIN(epoch_us(ts)) AS first_ts_us,
       MAX(epoch_us(ts)) AS last_ts_us
FROM events GROUP BY user_id
"""


EVENT_CATEGORY = {
    # hot-key dim payload: the 5 event types bucket into 3 funnels
    "view": "browse",
    "click": "browse",
    "purchase": "conversion",
    "signup": "conversion",
    "error": "fault",
}


def salted_event_category_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-category rollup joined THROUGH ``salted_join`` on the
    textbook hot key: ``event_type`` has ~5 distinct values over the
    whole fact table, so an unsalted shuffle join puts ~1/5 of the table
    on ONE task per key.  The salted path replicates the 5-row category
    dim {DEFAULT_SALTS}× and spreads each hot key over {DEFAULT_SALTS}
    tasks.

    The join is ``shuffle_hash``-hinted ON PURPOSE: a 5-row dim would
    otherwise broadcast (where skew is moot) and the salted shuffle path
    — the thing this entry exists to value-check — would never execute.
    At production scale the small side may be too large to broadcast;
    this is that regime, miniaturized.

    Post-join aggregates are exact (counts + distinct counts), so the
    gate compares hash-exact against DuckDB's plain join+GROUP BY.
    """
    from retail_sales_project_bigdata_spark.sources import read_events

    ev = read_events(spark, sf_dir).select("user_id", "event_id", "event_type")
    cat = spark.createDataFrame(
        sorted(EVENT_CATEGORY.items()), "event_type string, category string"
    )
    joined = salted_join(ev, cat.hint("shuffle_hash"), on="event_type")
    return (
        joined.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


_CATEGORY_VALUES = ", ".join(
    f"('{t}', '{c}')" for t, c in sorted(EVENT_CATEGORY.items())
)

SALTED_EVENT_CATEGORY_ROLLUP_SQL = f"""
WITH cat(event_type, category) AS (VALUES {_CATEGORY_VALUES})
SELECT c.category,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(COUNT(DISTINCT e.event_type) AS BIGINT) AS n_types
FROM events e JOIN cat c ON e.event_type = c.event_type
GROUP BY c.category
"""


ORACLES: dict[str, str] = {
    "join_key_skew_profile": JOIN_KEY_SKEW_PROFILE_SQL,
    "salted_user_event_counts": SALTED_USER_EVENT_COUNTS_SQL,
    "salted_event_category_rollup": SALTED_EVENT_CATEGORY_ROLLUP_SQL,
}

QUERIES = {
    "join_key_skew_profile": join_key_skew_profile,
    "salted_user_event_counts": salted_user_event_counts,
    "salted_event_category_rollup": salted_event_category_rollup,
}


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column → (input column, fn) with fn in
    {sum, count, min, max} (the decomposable aggregates — avg callers
    derive from sum/count).
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_aggs.append(F.count(F.col(col)).alias(f"_p_{out}"))
        else:
            phase1_aggs.append(getattr(F, fn)(F.col(col)).alias(f"_p_{out}"))
    partial = salted.groupBy(*key_cols, "_salt").agg(*phase1_aggs)

    phase2_aggs = []
    for out, (_, fn) in aggs.items():
        merge = "sum" if fn in ("count", "sum") else fn
        phase2_aggs.append(getattr(F, merge)(F.col(f"_p_{out}")).alias(out))
    return partial.groupBy(*key_cols).agg(*phase2_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Skew-safe equi join: salt the big side, replicate the small side.

    Replication factor = n_salts on the small side only — the big (skewed)
    side is read once.  Output columns = big's + small's (minus the
    duplicate key), like a plain ``join(..., on)``.
    """
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small_rep = small.withColumn("_salt", salts)
    big_salted = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    return big_salted.join(small_rep, [on, "_salt"], how).drop("_salt")
