"""Scale-safe interval (range) join — events ⋈ campaign windows.

The reference's only non-equi predicate is the repurchase range join
(``ChurnPrediction.java:147-154``), which rides on an equi key.  A pure
interval join — points vs windows with NO shared key — is the harder,
genuinely-100TB case: Spark's default physical plan for
``ev.join(camp, (ts >= start) & (ts < end))`` is
BroadcastNestedLoopJoin (fine only while the interval table broadcasts)
or, worse, a cartesian product.

This module implements the standard **bin-bucketing** rewrite (the same
strategy behind Databricks' range-join hints and KDB/Flink interval
joins): quantize time into fixed-width buckets, explode each interval to
the buckets it overlaps, tag each point with its single bucket, and
equi-join on the bucket before applying the exact range predicate.

  - The join becomes a plain hash/sort-merge equi-join on ``bucket`` —
    shuffle-partitionable, AQE-skew-splittable, no nested loop.  It
    survives interval tables far beyond broadcast size.
  - Each point lands in exactly ONE bucket and each (interval, bucket)
    pair is unique, so candidates are matched exactly once — no
    post-join dedup is needed, regardless of interval overlap.
  - Bucket width tunes candidate quality: ~= median interval length
    keeps the explode factor and the false-candidate rate both small.

Overlapping windows are exercised deliberately (10h-long campaigns every
7h), so events match multiple campaigns — the rewrite must not lose or
duplicate matches; the DuckDB oracle runs the naive range join (its
IEJoin handles it exactly) over identical integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import (
    DAY_EPOCH,
    oracle_sum,
    stable_sum,
)
from retail_sales_project_bigdata_spark.sources import (
    fan_out,
    read_events,
    read_table,
)

# Campaign grid over the events month (2024-01): campaign i starts at
# epoch + i*7h and runs 10h — consecutive campaigns overlap by 3h.
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
_SPACING_US = 7 * 3_600 * 1_000_000
_DURATION_US = 10 * 3_600 * 1_000_000
N_CAMPAIGNS = 100
BUCKET_US = 3_600 * 1_000_000  # 1h bins; explode factor ≤ 11 per campaign


def campaign_windows(spark: SparkSession) -> DataFrame:
    """The interval side: (campaign_id, start_us, end_us), end exclusive."""
    return spark.range(N_CAMPAIGNS).select(
        F.col("id").alias("campaign_id"),
        (F.lit(_EPOCH_US) + F.col("id") * F.lit(_SPACING_US)).alias("start_us"),
        (
            F.lit(_EPOCH_US) + F.col("id") * F.lit(_SPACING_US) + F.lit(_DURATION_US)
        ).alias("end_us"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = BUCKET_US,
) -> DataFrame:
    """Generic bin-bucketed interval join (point in [start, end)).

    Works for ANY interval table size: the bucket explode keeps the join
    equi (hash-partitionable on ``bucket``) instead of nested-loop.
    """
    # Integer floor-div, not double division: at int64 timestamp
    # magnitudes (nanos ~1.7e18) x/b computed in doubles carries a
    # ~2^8-unit error and can misbucket a boundary point, silently
    # dropping a true match.  DIV truncates toward zero == floor for the
    # non-negative timestamp domain this operator contracts.
    bu = int(bucket_us)
    ivals = intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"CAST({start_col} AS BIGINT) DIV {bu}"),
                F.expr(f"CAST(({end_col}) - 1 AS BIGINT) DIV {bu}"),
            )
        ),
    )
    pts = points.withColumn(
        "bucket", F.expr(f"CAST({ts_col} AS BIGINT) DIV {bu}")
    )
    return (
        pts.join(ivals, "bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("bucket")
    )


def campaign_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-campaign event counts + value over the interval join."""
    ev = fan_out(read_events(spark, sf_dir)).select("ts_us", "value")
    joined = interval_join(ev, campaign_windows(spark))
    return joined.groupBy("campaign_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        stable_sum("value").alias("sum_value"),
    )


CAMPAIGN_EVENT_ROLLUP_SQL = f"""
WITH camp AS (
  SELECT range AS campaign_id,
         {_EPOCH_US} + range * {_SPACING_US} AS start_us,
         {_EPOCH_US} + range * {_SPACING_US} + {_DURATION_US} AS end_us
  FROM range(0, {N_CAMPAIGNS})
),
ev AS (SELECT epoch_us(ts) AS ts_us, value FROM events)
SELECT c.campaign_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {oracle_sum('e.value')} AS sum_value
FROM ev e JOIN camp c
  ON e.ts_us >= c.start_us AND e.ts_us < c.end_us
GROUP BY c.campaign_id
"""


MAX_FULFILL_DAYS = 90  # open-window clamp: bounds the per-row fan-out


def open_lines_by_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-fulfillment inventory curve: for every calendar week, how
    many lineitems were ordered but not yet shipped (order date ≤ some
    day in the week < ship date), with their total quantity — the
    backlog/WIP time series behind capacity planning.

    This is the DUAL range-join shape to :func:`campaign_event_rollup`:
    there the intervals were a small generated dim; here the intervals
    ARE the fact rows and the "points" are the (implicit) week spine, so
    the bucketed rewrite degenerates into pure interval→bucket
    **explosion + hash aggregate** — no join at all.  The fan-out is
    bounded by the ``MAX_FULFILL_DAYS`` clamp (≤ {max_weeks} weeks/row;
    windows outside (0, 90] days are data errors in this synthetic feed
    and are excluded — same rows excluded in the oracle).

    Exactness/scale: week indexes are integer floor-divisions on day
    counts from {epoch}; quantity is integral (cast long) so the rollup
    is exact; ONE shuffle (the week aggregate) over the exploded frame,
    which AQE coalesces — the orders⋈lineitem equi-join before it rides
    the orderkey.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_shipdate"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_quantity").cast("long").alias("qty"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(DAY_EPOCH).cast("date")
        ).alias("d0"),
        F.datediff(
            F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("lag"),
    )
    open_ = j.filter(
        (F.col("lag") > 0) & (F.col("lag") <= MAX_FULFILL_DAYS)
    ).select(
        "qty",
        F.explode(
            F.sequence(
                F.expr("d0 DIV 7"),
                F.expr("(d0 + lag - 1) DIV 7"),
            )
        ).alias("week_no"),
    )
    return open_.groupBy("week_no").agg(
        F.count(F.lit(1)).alias("n_open_lines"),
        F.sum("qty").alias("open_qty"),
    )


open_lines_by_week.__doc__ = open_lines_by_week.__doc__.format(
    max_weeks=MAX_FULFILL_DAYS // 7 + 2, epoch=DAY_EPOCH
)


OPEN_LINES_BY_WEEK_SQL = f"""
WITH j AS (
  SELECT CAST(l.l_quantity AS BIGINT) AS qty,
         datediff('day', DATE '{DAY_EPOCH}', CAST(o.o_orderdate AS DATE)) AS d0,
         datediff('day', CAST(o.o_orderdate AS DATE),
                  CAST(l.l_shipdate AS DATE)) AS lag
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
weeks AS (
  SELECT qty, unnest(generate_series(d0 // 7, (d0 + lag - 1) // 7)) AS week_no
  FROM j WHERE lag > 0 AND lag <= {MAX_FULFILL_DAYS}
)
SELECT week_no,
       CAST(COUNT(*) AS BIGINT) AS n_open_lines,
       CAST(SUM(qty) AS BIGINT) AS open_qty
FROM weeks GROUP BY week_no
"""


ORACLES: dict[str, str] = {
    "campaign_event_rollup": CAMPAIGN_EVENT_ROLLUP_SQL,
    "open_lines_by_week": OPEN_LINES_BY_WEEK_SQL,
}

QUERIES = {
    "campaign_event_rollup": campaign_event_rollup,
    "open_lines_by_week": open_lines_by_week,
}
