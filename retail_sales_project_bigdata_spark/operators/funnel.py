"""Conversion-funnel and event-transition analytics over ``events``.

North-star behavioral queries the reference's retail stack implies but
never ships (its event analysis stops at promo-day flags,
``ChurnPrediction.java`` §3.2): an ordered view→click→purchase funnel and
a first-order Markov transition matrix between consecutive event types.

Timestamp discipline follows ``sessions.py``: all ordering runs on the
exact int64 microsecond value (``ts_us`` / ``epoch_us(ts)``) so Spark and
DuckDB compare identical integers.

Scale notes:
- ``funnel_stages`` is one shuffle on ``user_id`` with map-side combine
  (conditional MIN per event type), then a single-row global aggregate —
  the per-user frame never materializes wide.  The 3-row output is built
  with ``inline(array(struct...))`` on the aggregated row, not a driver
  loop.
- ``event_transition_matrix`` reuses one (user_id) shuffle for the lag
  window, then aggregates to at most |types|² rows; the per-source
  normalizer is a tiny window over that aggregate, not a rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from retail_sales_project_bigdata_spark.sources import read_events

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: a user reaches a stage only if their FIRST event of
    that type comes strictly after their first event of the previous stage
    (first view < first click < first purchase).  Returns one row per
    stage with the user count and the conversion rate from the previous
    stage (stage 1 converts from the all-users base)."""
    ev = read_events(spark, sf_dir)
    mins = [
        F.min(
            F.when(F.col("event_type") == step, F.col("ts_us"))
        ).alias(f"t_{step}")
        for step in FUNNEL_STEPS
    ]
    per_user = ev.groupBy("user_id").agg(*mins)
    flags = (
        per_user.withColumn("r1", F.col("t_view").isNotNull())
        .withColumn(
            "r2",
            F.coalesce(
                F.col("r1") & (F.col("t_click") > F.col("t_view")),
                F.lit(False),
            ),
        )
        .withColumn(
            "r3",
            F.coalesce(
                F.col("r2") & (F.col("t_purchase") > F.col("t_click")),
                F.lit(False),
            ),
        )
    )
    totals = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(F.col("r1").cast("long")).alias("n1"),
        F.sum(F.col("r2").cast("long")).alias("n2"),
        F.sum(F.col("r3").cast("long")).alias("n3"),
    )
    stage_structs = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("stage_no"),
                F.lit(step).alias("stage"),
                F.col(f"n{i + 1}").alias("users"),
                F.when(
                    F.col(f"n{i}") > 0,
                    F.col(f"n{i + 1}").cast("double")
                    / F.col(f"n{i}").cast("double"),
                ).alias("conv_rate"),
            )
            for i, step in enumerate(FUNNEL_STEPS)
        ]
    )
    return totals.select(F.inline(stage_structs))


FUNNEL_STAGES_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
  FROM events GROUP BY user_id
),
flags AS (
  SELECT (t_view IS NOT NULL) AS r1,
         COALESCE(t_view IS NOT NULL AND t_click > t_view, FALSE) AS r2,
         COALESCE((t_view IS NOT NULL AND t_click > t_view)
                  AND t_purchase > t_click, FALSE) AS r3
  FROM per_user
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM flags
)
SELECT 1 AS stage_no, 'view' AS stage, n1 AS users,
       CASE WHEN n0 > 0 THEN CAST(n1 AS DOUBLE) / CAST(n0 AS DOUBLE) END AS conv_rate
FROM totals
UNION ALL
SELECT 2, 'click', n2,
       CASE WHEN n1 > 0 THEN CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE) END
FROM totals
UNION ALL
SELECT 3, 'purchase', n3,
       CASE WHEN n2 > 0 THEN CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE) END
FROM totals
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition counts between consecutive event types per
    user (ordered by ts, event_id; the first event of a user transitions
    from the synthetic 'START' state), with the row-normalized transition
    probability — an exact bigint/bigint double division on both engines."""
    ev = read_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    counts = (
        ev.withColumn(
            "prev_type", F.coalesce(F.lag("event_type").over(w), F.lit("START"))
        )
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_src = Window.partitionBy("prev_type")
    return counts.withColumn(
        "prob",
        F.col("n").cast("double")
        / F.sum("n").over(per_src).cast("double"),
    )


EVENT_TRANSITION_MATRIX_SQL = """
WITH lagged AS (
  SELECT COALESCE(
           LAG(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id),
           'START') AS prev_type,
         event_type AS next_type
  FROM events
),
counts AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM lagged GROUP BY prev_type, next_type
)
SELECT prev_type, next_type, n,
       CAST(n AS DOUBLE)
         / CAST(CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS DOUBLE)
         AS prob
FROM counts
"""


ATTRIBUTION_LOOKBACK_US = 7 * 86_400_000_000  # 7-day touch window

# Sortable string encoding of (ts_us, event_id): zero-padded fixed-width
# concatenation, so lexicographic MIN/MAX == (ts, id) order in BOTH
# engines (struct/row-value MIN is not portable across Spark and DuckDB).
# Pad widths cover the full non-negative int64 domain (19 decimal digits;
# lpad TRUNCATES overlong inputs in both engines, which would corrupt the
# ordering silently — 12 was enough for the testdata but not for 64-bit
# production ids).
_TOUCH_KEY_SPARK = (
    "concat(lpad(cast(ts_us as string), 20, '0'), ':',"
    " lpad(cast(event_id as string), 19, '0'))"
)


def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch / last-touch attribution: for every purchase, the
    earliest and latest view/click by the same user within the trailing
    7-day window, plus the touch count.

    One shuffle (partition by user, order by exact µs), every measure a
    conditional aggregate over the same RANGE frame — the frame bound is
    VALUE-based (microseconds), so sparse and dense users get the same
    semantics.  Touches are encoded as zero-padded sortable strings so
    ``min``/``max`` pick the (ts, event_id)-ordered touch portably.  At
    100 TB this is the window-join-free attribution shape: no
    purchase×touch pair blowup, state bounded by the lookback.
    """
    ev = read_events(spark, sf_dir).select(
        "event_id", "ts_us", "user_id", "event_type"
    )
    touch_key = F.when(
        F.col("event_type").isin("view", "click"), F.expr(_TOUCH_KEY_SPARK)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ATTRIBUTION_LOOKBACK_US, 0)
    )
    enriched = ev.select(
        "event_id",
        "ts_us",
        "user_id",
        "event_type",
        F.min(touch_key).over(w).alias("first_touch_key"),
        F.max(touch_key).over(w).alias("last_touch_key"),
        F.count(touch_key).over(w).cast("long").alias("n_touches"),
    )

    def _key_event_id(key_col: str) -> F.Column:
        return F.substring(F.col(key_col), 22, 19).cast("long")

    return enriched.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts_us").alias("purchase_ts_us"),
        _key_event_id("first_touch_key").alias("first_touch_event_id"),
        _key_event_id("last_touch_key").alias("last_touch_event_id"),
        "n_touches",
    )


PURCHASE_TOUCH_ATTRIBUTION_SQL = f"""
WITH ev AS (
  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type FROM events
),
enriched AS (
  SELECT event_id, ts_us, user_id, event_type,
         MIN(CASE WHEN event_type IN ('view', 'click')
                  THEN lpad(CAST(ts_us AS VARCHAR), 20, '0') || ':'
                       || lpad(CAST(event_id AS VARCHAR), 19, '0')
             END) OVER w AS first_touch_key,
         MAX(CASE WHEN event_type IN ('view', 'click')
                  THEN lpad(CAST(ts_us AS VARCHAR), 20, '0') || ':'
                       || lpad(CAST(event_id AS VARCHAR), 19, '0')
             END) OVER w AS last_touch_key,
         CAST(COUNT(CASE WHEN event_type IN ('view', 'click') THEN 1 END)
              OVER w AS BIGINT) AS n_touches
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN {ATTRIBUTION_LOOKBACK_US} PRECEDING
                         AND CURRENT ROW)
)
SELECT event_id AS purchase_event_id, user_id, ts_us AS purchase_ts_us,
       CAST(substring(first_touch_key, 22, 19) AS BIGINT)
           AS first_touch_event_id,
       CAST(substring(last_touch_key, 22, 19) AS BIGINT)
           AS last_touch_event_id,
       n_touches
FROM enriched WHERE event_type = 'purchase'
"""


ORACLES: dict[str, str] = {
    "purchase_touch_attribution": PURCHASE_TOUCH_ATTRIBUTION_SQL,
    "funnel_stages": FUNNEL_STAGES_SQL,
    "event_transition_matrix": EVENT_TRANSITION_MATRIX_SQL,
}

QUERIES = {
    "purchase_touch_attribution": purchase_touch_attribution,
    "funnel_stages": funnel_stages,
    "event_transition_matrix": event_transition_matrix,
}
