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


ORACLES: dict[str, str] = {
    "funnel_stages": FUNNEL_STAGES_SQL,
    "event_transition_matrix": EVENT_TRANSITION_MATRIX_SQL,
}

QUERIES = {
    "funnel_stages": funnel_stages,
    "event_transition_matrix": event_transition_matrix,
}
