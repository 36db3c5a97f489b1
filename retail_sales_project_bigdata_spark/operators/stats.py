"""Exact distributed statistics: grouped Pearson correlation / simple
linear regression and IQR outlier detection.

The reference computes no second-moment statistics (its aggregation
surface stops at sum/count/min/max — SURVEY §2.4); these are the
descriptive-stats layer any retail engine grows next, built
deterministically enough to value-hash against DuckDB.

Why not ``F.corr`` / ``regr_slope``: both engines implement them as
streaming double accumulations whose partial-merge order differs, so the
last ulps wobble run-to-run AND engine-to-engine.  Instead every moment
is an EXACT integer sum on the value grid (quantity is integral, price
is 2-decimal ⇒ cents are integral), accumulated as ``decimal(38,0)`` /
HUGEINT (overflow-safe at 100 TB: Σx·y ≲ 1e11/row · 1e12 rows < 1e23 ≪
1e38), and only the FINAL closed-form expression runs in floating point —
the identical expression tree on identical operands is IEEE-deterministic
on both engines (sqrt is correctly rounded).

Scale notes: one map-side-combinable shuffle per query for the moments
(3 groups); the IQR pass broadcasts the 3-row bounds frame back onto the
fact scan, so the second pass is shuffle-free.  The exact interpolated
percentile runs in the integer cents domain, where every intermediate
(positions are multiples of 0.25, values < 2^50) is exactly
representable — the bounds compare without tie ambiguity.  At 100 TB the
percentile pass would switch to ``approx_percentile`` (mergeable
t-digest; see ``olap.price_percentiles_approx``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from retail_sales_project_bigdata_spark.functions import DAY_EPOCH, pround
from retail_sales_project_bigdata_spark.sources import read_table

_D38 = "decimal(38,0)"


def _cents(col: str) -> Column:
    """Exact integer cents from a 2-decimal-grid double (ROUND then cast:
    after rounding the value is exactly integral, so Spark's truncating
    cast and DuckDB's rounding cast agree)."""
    return F.round(F.col(col) * 100, 0).cast("long")


def sales_stats_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag covariance, Pearson correlation, and OLS
    slope/intercept of extended price (cents) on quantity — all from
    exact integer moments; see module docstring for the determinism
    argument.  ``slope_cents`` is cents-per-unit-quantity."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("q"),
        _cents("l_extendedprice").alias("p"),
    )
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("q").cast(_D38)).alias("sx"),
        F.sum(F.col("p").cast(_D38)).alias("sy"),
        F.sum((F.col("q") * F.col("q")).cast(_D38)).alias("sxx"),
        F.sum((F.col("q") * F.col("p")).cast(_D38)).alias("sxy"),
        F.sum((F.col("p") * F.col("p")).cast(_D38)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov = (sxy - sx * sy / nd) / nd
    varx = (sxx - sx * sx / nd) / nd
    vary = (syy - sy * sy / nd) / nd
    slope = cov / varx
    return m.select(
        "l_returnflag",
        "n",
        cov.alias("cov_qty_cents"),
        F.when(
            (varx > 0) & (vary > 0), cov / F.sqrt(varx * vary)
        ).alias("corr_qty_price"),
        F.when(varx > 0, slope).alias("slope_cents"),
        F.when(varx > 0, sy / nd - slope * (sx / nd)).alias(
            "intercept_cents"
        ),
    )


SALES_STATS_BY_FLAG_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CAST(FLOOR(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p
  FROM lineitem
),
m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS DOUBLE) AS sx,
         CAST(SUM(p) AS DOUBLE) AS sy,
         CAST(SUM(q * q) AS DOUBLE) AS sxx,
         CAST(SUM(q * p) AS DOUBLE) AS sxy,
         CAST(SUM(p * p) AS DOUBLE) AS syy
  FROM base GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS cov_qty_cents,
       CASE WHEN (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0
             AND (syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0
            THEN ((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                 / SQRT(((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                        * ((syy - sy * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
       END AS corr_qty_price,
       CASE WHEN (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0
            THEN ((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                 / ((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
       END AS slope_cents,
       CASE WHEN (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) > 0
            THEN sy / CAST(n AS DOUBLE)
                 - (((sxy - sx * sy / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                    / ((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))
                   * (sx / CAST(n AS DOUBLE))
       END AS intercept_cents
FROM m
"""


IQR_K = 1.5


def price_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier profile per returnflag: quartiles of price in
    exact integer cents, fences at q1/q3 ∓ 1.5·IQR, then a broadcast
    join back onto the scan to count and bound the outliers.  Every
    compared quantity is an exact multiple of 0.25 (interpolation
    positions are quarter-points over integers), so membership never
    depends on engine rounding."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", _cents("l_extendedprice").alias("p")
    )
    q = li.groupBy("l_returnflag").agg(
        F.percentile("p", 0.25).alias("q1"),
        F.percentile("p", 0.75).alias("q3"),
    )
    bounds = q.select(
        "l_returnflag",
        "q1",
        "q3",
        (F.col("q1") - IQR_K * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + IQR_K * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    flagged = li.join(F.broadcast(bounds), "l_returnflag")
    return flagged.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("q1").alias("q1_cents"),
        F.first("q3").alias("q3_cents"),
        F.first("lo").alias("lo_cents"),
        F.first("hi").alias("hi_cents"),
        F.sum(F.when(F.col("p") < F.col("lo"), 1).otherwise(0)).alias(
            "n_low"
        ),
        F.sum(F.when(F.col("p") > F.col("hi"), 1).otherwise(0)).alias(
            "n_high"
        ),
    ).withColumn(
        "outlier_share",
        (F.col("n_low") + F.col("n_high")).cast("double")
        / F.col("n").cast("double"),
    )


PRICE_OUTLIERS_IQR_SQL = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p
  FROM lineitem
),
q AS (
  SELECT l_returnflag,
         quantile_cont(p, 0.25) AS q1,
         quantile_cont(p, 0.75) AS q3
  FROM base GROUP BY l_returnflag
),
bounds AS (
  SELECT l_returnflag, q1, q3,
         q1 - {IQR_K} * (q3 - q1) AS lo,
         q3 + {IQR_K} * (q3 - q1) AS hi
  FROM q
)
SELECT b.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(bo.q1) AS q1_cents,
       MIN(bo.q3) AS q3_cents,
       MIN(bo.lo) AS lo_cents,
       MIN(bo.hi) AS hi_cents,
       CAST(SUM(CASE WHEN b.p < bo.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN b.p > bo.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(SUM(CASE WHEN b.p < bo.lo OR b.p > bo.hi THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS outlier_share
FROM base b JOIN bounds bo USING (l_returnflag)
GROUP BY b.l_returnflag
"""


def quantity_central_tendency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped median + deterministic mode of ``l_quantity`` per
    return flag.

    - Median: ``F.median`` (interpolated percentile-0.5).  On the
      integer-valued quantity grid the midpoint average is exact in both
      engines, so it oracle-matches DuckDB's ``median`` bit-for-bit.
    - Mode: Spark's ``F.mode`` breaks frequency ties arbitrarily, so the
      deterministic form is spelled as a two-phase aggregation — count
      per (group, value), then keep the (count DESC, value ASC)-first
      row.  Two shuffles, both on small (group, value) domains; the
      second input is already value-grained, far below fact size.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    med = li.groupBy("l_returnflag").agg(
        F.median("l_quantity").alias("median_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mode = counts.groupBy("l_returnflag").agg(
        F.max_by(
            F.col("l_quantity"),
            F.struct(F.col("cnt"), -F.col("l_quantity")),
        ).alias("mode_qty"),
        F.max("cnt").alias("mode_count"),
    )
    return med.join(mode, "l_returnflag").select(
        "l_returnflag", "n_rows", "median_qty", "mode_qty", "mode_count"
    )


QUANTITY_CENTRAL_TENDENCY_SQL = """
WITH med AS (
  SELECT l_returnflag, MEDIAN(l_quantity) AS median_qty,
         COUNT(*) AS n_rows
  FROM lineitem GROUP BY l_returnflag
),
counts AS (
  SELECT l_returnflag, l_quantity, COUNT(*) AS cnt
  FROM lineitem GROUP BY l_returnflag, l_quantity
),
mode AS (
  SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
  FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_returnflag ORDER BY cnt DESC, l_quantity ASC) AS rn
    FROM counts
  ) WHERE rn = 1
)
SELECT m.l_returnflag, m.n_rows, m.median_qty, mo.mode_qty, mo.mode_count
FROM med m JOIN mode mo USING (l_returnflag)
"""


def order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per nation: for each customer the gaps (in
    days) between consecutive orders, rolled up to nation-level count /
    exact median / mean / min / max — the purchase-frequency profile a
    replenishment or churn model consumes.

    One fact shuffle: the lag window partitions by customer; gap rows
    then aggregate by (broadcast-joined) nation.  Gaps are integers, so
    ``median`` (midpoint interpolation on the int grid) and ``sum/count``
    are bit-exact across engines with no rounding discipline needed
    beyond the final display round.
    """
    from pyspark.sql.window import Window

    from retail_sales_project_bigdata_spark.functions import day_index, pround

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", day_index("o_orderdate").alias("day"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    gaps = (
        orders.withColumn("gap", F.col("day") - F.lag("day").over(w))
        .filter(F.col("gap").isNotNull())
        .select("o_custkey", "gap")
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    return (
        gaps.join(cust, gaps.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.median("gap").alias("median_gap_days"),
            pround(F.sum("gap") / F.count(F.lit(1)), 6).alias(
                "mean_gap_days"
            ),
            F.min("gap").alias("min_gap_days"),
            F.max("gap").alias("max_gap_days"),
        )
    )


ORDER_GAP_STATS_SQL = f"""
WITH ord AS (
  SELECT o_custkey,
         CAST(datediff('day', DATE '{DAY_EPOCH}', CAST(o_orderdate AS DATE)) + 1
              AS INT) AS day,
         o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         day - LAG(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap
  FROM ord
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       MEDIAN(g.gap) AS median_gap_days,
       ROUND(CAST(SUM(g.gap) AS DOUBLE) / COUNT(*), 6) AS mean_gap_days,
       MIN(g.gap) AS min_gap_days,
       MAX(g.gap) AS max_gap_days
FROM gaps g
JOIN customer c ON g.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE g.gap IS NOT NULL
GROUP BY n.n_name
"""


DECILE_PROBS = [round(0.1 * i, 1) for i in range(1, 10)]


def price_decile_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile binning via BROADCAST BOUNDARIES — the scale pattern that
    replaces a global NTILE over the fact table: the 9 decile boundaries
    are ONE tiny aggregate (exact interpolated percentiles over integer
    cents — the price_outliers_iqr recipe), broadcast back with a
    crossJoin, and every row's bucket is map-only arithmetic (count of
    boundaries strictly below the value; ties go to the lower bucket).
    No sort, no window, no per-row shuffle — the assignment scales as a
    scan.  Returns the per-decile profile (count, min/max cents).

    Value semantics note: this is VALUE-boundary binning (ties share a
    bucket), deliberately different from rank-based NTILE (ties split by
    position) — the variant you want when bucket membership must be a
    pure function of the value.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        _cents("l_extendedprice").alias("p")
    )
    probs = F.array(*[F.lit(q) for q in DECILE_PROBS])
    bounds = li.agg(F.percentile("p", probs).alias("bs"))
    assigned = li.crossJoin(F.broadcast(bounds)).select(
        "p",
        (
            F.lit(1)
            + F.size(F.filter("bs", lambda b: b < F.col("p")))
        ).alias("decile"),
    )
    return assigned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("p").alias("min_cents"),
        F.max("p").alias("max_cents"),
    )


_DECILE_LIST = ", ".join(str(q) for q in DECILE_PROBS)

PRICE_DECILE_ASSIGNMENTS_SQL = f"""
WITH base AS (
  SELECT CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p FROM lineitem
),
bounds AS (
  SELECT quantile_cont(p, [{_DECILE_LIST}]) AS bs FROM base
),
assigned AS (
  SELECT p, 1 + len(list_filter(bs, b -> b < p)) AS decile
  FROM base CROSS JOIN bounds
)
SELECT decile, COUNT(*) AS n,
       MIN(p) AS min_cents, MAX(p) AS max_cents
FROM assigned GROUP BY decile
"""


ANOMALY_TRAIL = 8  # trailing baseline window, in observed weeks
ANOMALY_MIN_BASE = 4  # minimum baseline weeks before a score is emitted
ANOMALY_Z2 = 4  # z² threshold — flag |z| > 2


def revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags over weekly per-nation order revenue
    — the monitoring primitive ("this week is >2σ off its trailing
    baseline") every revenue dashboard runs.

    Determinism doctrine (module docstring): the baseline moments
    (count, Σx, Σx²) accumulate on the exact integer cents grid as
    ``decimal(38,0)`` — overflow-safe at 100 TB and bit-equal to
    DuckDB's HUGEINT — and the anomaly FLAG itself is a pure integer
    comparison, (n·x − S)² > z²·(n·Q − S²), so it never touches floating
    point at all.  Only the reported z-score is a double, produced by
    one exact→double conversion per operand plus one sqrt and one
    division (each correctly rounded, hence engine-identical).

    Scale: the fact-sized work is a single (nation, week) hash
    aggregate; the window runs over the AGGREGATED frame partitioned by
    nation with a frame bounded by the calendar (weeks don't grow with
    data volume), so there is no global window and no task that owns
    more than one nation's timeline.  The baseline is the trailing
    {ANOMALY_TRAIL} OBSERVED weeks (rowsBetween, not rangeBetween):
    gap weeks shrink the lookback horizon rather than the sample.
    """
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit(DAY_EPOCH)) + 1
    weekly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn(
            "week_no", F.ceil(day / F.lit(7.0)).cast("int")
        )
        .groupBy("n_name", "week_no")
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
    )
    w = (
        Window.partitionBy("n_name")
        .orderBy("week_no")
        .rowsBetween(-ANOMALY_TRAIL, -1)
    )
    rev_d = F.col("rev").cast(_D38)
    scored = weekly.select(
        "n_name",
        "week_no",
        "rev",
        F.count("rev").over(w).alias("n_base"),
        F.sum(rev_d).over(w).alias("s"),
        F.sum(rev_d * rev_d).over(w).alias("q"),
    )
    num = F.col("n_base") * F.col("rev").cast(_D38) - F.col("s")
    den = F.col("n_base") * F.col("q") - F.col("s") * F.col("s")
    ok = (F.col("n_base") >= ANOMALY_MIN_BASE) & (den > 0)
    return scored.select(
        "n_name",
        "week_no",
        F.col("rev").alias("revenue_cents"),
        F.col("n_base").cast("long").alias("n_base"),
        F.when(
            ok,
            pround(
                num.cast("double") / F.sqrt(den.cast("double")), 6
            ),
        ).alias("zscore"),
        F.when(
            (F.col("n_base") >= ANOMALY_MIN_BASE)
            & (num * num > F.lit(ANOMALY_Z2) * den),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_anomaly"),
    )


REVENUE_ANOMALIES_SQL = f"""
WITH weekly AS (
  SELECT n.n_name,
         CAST(CEIL((datediff('day', DATE '{DAY_EPOCH}',
                             CAST(o.o_orderdate AS DATE)) + 1) / 7.0)
              AS INT) AS week_no,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
scored AS (
  SELECT n_name, week_no, rev,
         COUNT(rev) OVER wtrail AS n_base,
         SUM(CAST(rev AS HUGEINT)) OVER wtrail AS s,
         SUM(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) OVER wtrail AS q
  FROM weekly
  WINDOW wtrail AS (PARTITION BY n_name ORDER BY week_no
                    ROWS BETWEEN {ANOMALY_TRAIL} PRECEDING AND 1 PRECEDING)
)
SELECT n_name, week_no, rev AS revenue_cents,
       CAST(n_base AS BIGINT) AS n_base,
       CASE WHEN n_base >= {ANOMALY_MIN_BASE}
                 AND (n_base * q - s * s) > 0
            THEN ROUND(CAST(n_base * rev - s AS DOUBLE)
                       / sqrt(CAST(n_base * q - s * s AS DOUBLE)), 6)
       END AS zscore,
       CASE WHEN n_base >= {ANOMALY_MIN_BASE}
                 AND (n_base * rev - s) * (n_base * rev - s)
                     > {ANOMALY_Z2} * (n_base * q - s * s)
            THEN 1 ELSE 0
       END AS is_anomaly
FROM scored
"""


MK_Z_THRESHOLD = 1.96  # two-sided 5% significance


def trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test over each nation's weekly
    revenue series — the standard nonparametric "is this KPI actually
    trending" statistic (no distribution assumption, robust to spikes).

    Exactness: the S statistic (Σ sign(x_j − x_i) over ordered week
    pairs) and the ties-adjusted variance NUMERATOR
    ``var18 = n(n−1)(2n+5) − Σ t(t−1)(2t+5)`` are pure integers; the
    z-score is the only float — built from one exact→double conversion,
    one division by 18, one sqrt, one division (each correctly rounded,
    hence engine-identical), then rounded to 6.

    Scale: the pair self-join is per-nation over the WEEKLY aggregate —
    the frame is calendar-bounded (|weeks|² pairs per nation regardless
    of row volume), so the quadratic is in the time dimension, which
    does not grow with data size.  Fact-sized work is the single
    (nation, week) hash aggregate; everything after shuffles |nations| ×
    |weeks| rows on the nation key.
    """
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit(DAY_EPOCH)) + 1
    weekly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("week_no", F.ceil(day / F.lit(7.0)).cast("int"))
        .groupBy("n_name", "week_no")
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
        .persist()  # three consumers: both pair sides + the tie counts
    )
    a = weekly.select(
        "n_name", F.col("week_no").alias("w_i"), F.col("rev").alias("x_i")
    )
    b = weekly.select(
        "n_name", F.col("week_no").alias("w_j"), F.col("rev").alias("x_j")
    )
    s_stat = (
        a.join(b, "n_name")
        .filter(F.col("w_i") < F.col("w_j"))
        .groupBy("n_name")
        .agg(
            F.sum(F.signum(F.col("x_j") - F.col("x_i")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    ties = (
        weekly.groupBy("n_name", "rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term"),
            F.sum(F.lit(1)).alias("n_weeks"),
        )
    )
    joined = s_stat.join(ties, "n_name")
    n = F.col("n_weeks")
    var18 = (n * (n - 1) * (2 * n + 5) - F.col("tie_term")).alias("var18")
    # continuity-corrected z: (S − sign(S)) / sqrt(var18 / 18)
    num = F.col("s_stat") - F.signum(F.col("s_stat")).cast("long")
    z = F.when(
        F.col("var18") > 0,
        pround(
            num.cast("double")
            / F.sqrt(F.col("var18").cast("double") / F.lit(18.0)),
            6,
        ),
    )
    return (
        joined.select(
            "n_name",
            F.col("n_weeks").cast("long").alias("n_weeks"),
            "s_stat",
            var18,
        )
        .withColumn("zscore", z)
        .withColumn(
            "trend",
            F.when(
                F.col("zscore").isNull(), F.lit("no_trend")
            )
            .when(F.col("zscore") > MK_Z_THRESHOLD, F.lit("increasing"))
            .when(F.col("zscore") < -MK_Z_THRESHOLD, F.lit("decreasing"))
            .otherwise(F.lit("no_trend")),
        )
    )


TREND_MANN_KENDALL_SQL = f"""
WITH weekly AS (
  SELECT n.n_name,
         CAST(CEIL((datediff('day', DATE '{DAY_EPOCH}',
                             CAST(o.o_orderdate AS DATE)) + 1) / 7.0)
              AS INT) AS week_no,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
s AS (
  SELECT a.n_name,
         CAST(SUM(CAST(sign(b.rev - a.rev) AS BIGINT)) AS BIGINT) AS s_stat
  FROM weekly a JOIN weekly b
    ON a.n_name = b.n_name AND a.week_no < b.week_no
  GROUP BY 1
),
ties AS (
  SELECT n_name,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
         CAST(COUNT(*) AS BIGINT) AS n_weeks
  FROM (SELECT n_name, rev, COUNT(*) AS t FROM weekly GROUP BY 1, 2)
  GROUP BY 1
),
joined AS (
  SELECT s.n_name, t.n_weeks, s.s_stat,
         t.n_weeks * (t.n_weeks - 1) * (2 * t.n_weeks + 5) - t.tie_term
           AS var18
  FROM s JOIN ties t ON s.n_name = t.n_name
),
scored AS (
  SELECT n_name, n_weeks, s_stat, var18,
         CASE WHEN var18 > 0
              THEN ROUND(CAST(s_stat - CAST(sign(s_stat) AS BIGINT)
                              AS DOUBLE)
                         / sqrt(CAST(var18 AS DOUBLE) / 18.0), 6)
         END AS zscore
  FROM joined
)
SELECT n_name, n_weeks, s_stat, var18, zscore,
       CASE WHEN zscore IS NULL THEN 'no_trend'
            WHEN zscore > {MK_Z_THRESHOLD} THEN 'increasing'
            WHEN zscore < -{MK_Z_THRESHOLD} THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM scored
"""


import math as _math

# Benford first-digit probabilities log10(1 + 1/d), embedded as repr
# round-trip literals so BOTH engines consume identical doubles (the
# _plane_sql trick from similarity.py) — neither engine's log10 is
# trusted to be correctly rounded.
_BENFORD_P = [_math.log10(1 + 1 / d) for d in range(1, 10)]


def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-significant-digit audit over order totals —
    the classic fabricated-figures / data-quality screen (real
    multiplicative amounts follow log10(1+1/d); synthetic or truncated
    feeds don't).

    Per digit 1-9: observed count, Benford-expected count, and the χ²
    contribution.  The digit extraction stays on the exact integer cents
    grid (first char of the cents integer — same significant digits as
    the price); counts are exact; the only floats are expected = n·p and
    the χ² term, built from identical literal p's and identically
    associated correctly-rounded ops on both engines, then rounded to 6.

    Scale: one map-side-combinable 9-group aggregate over the fact scan;
    the total-row window runs over the 9-row aggregate frame (constant),
    and the probability lookup is a 9-element array literal — no second
    fact pass, no join.
    """
    orders = read_table(spark, sf_dir, "orders").select("o_totalprice")
    digit = F.substring(
        _cents("o_totalprice").cast("string"), 1, 1
    ).cast("int")
    counts = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    n = F.sum("n_obs").over(Window.partitionBy())  # 9-row agg frame
    p = F.element_at(
        F.array(*[F.lit(x) for x in _BENFORD_P]), F.col("digit")
    )
    expected = n.cast("double") * p
    dev = F.col("n_obs") - expected
    return counts.select(
        "digit",
        "n_obs",
        pround(expected, 6).alias("expected"),
        pround(dev * dev / expected, 6).alias("chi2_term"),
    )


_BENFORD_VALUES = ", ".join(
    f"({d}, {x!r})" for d, x in enumerate(_BENFORD_P, start=1)
)

BENFORD_PRICE_AUDIT_SQL = f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
c AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY 1),
t AS (SELECT digit, n_obs, SUM(n_obs) OVER () AS n FROM c),
p AS (SELECT * FROM (VALUES {_BENFORD_VALUES}) AS v(digit, pexp))
SELECT t.digit, t.n_obs,
       ROUND(CAST(t.n AS DOUBLE) * p.pexp, 6) AS expected,
       ROUND((t.n_obs - CAST(t.n AS DOUBLE) * p.pexp)
             * (t.n_obs - CAST(t.n AS DOUBLE) * p.pexp)
             / (CAST(t.n AS DOUBLE) * p.pexp), 6) AS chi2_term
FROM t JOIN p ON t.digit = p.digit
"""


MAD_K = 4.4478  # 3.0 robust-z cutoff × 1.4826 (normal consistency)


def price_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier profile per returnflag — the
    robust twin of :func:`price_outliers_iqr` (median/MAD have a 50%
    breakdown point vs the quartiles' 25%; the standard screen when the
    tail itself is suspect).

    Exactness: the median of integer cents is a multiple of 0.5, every
    |p − med| is then a multiple of 0.5, and THEIR median (the MAD) a
    multiple of 0.25 — all exactly representable, so both engines
    interpolate to identical doubles.  The fence ``MAD_K · mad`` is one
    correctly-rounded multiply of identical operands.

    Scale: three passes over a 2-column scan — medians per flag, then
    deviations + MAD (join on the broadcast 3-row medians frame), then
    the outlier count against the broadcast fences.  MAD is inherently
    two-level (median OF deviations FROM the median), so two of the
    passes are irreducible; at 100 TB each pass is a map-side-combinable
    3-group aggregate and the percentile switches to approx_percentile
    like the IQR docstring notes.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", _cents("l_extendedprice").alias("p")
    )
    med = li.groupBy("l_returnflag").agg(
        F.percentile("p", 0.5).alias("med")
    )
    dev = li.join(F.broadcast(med), "l_returnflag").withColumn(
        "dev", F.abs(F.col("p") - F.col("med"))
    )
    fences = (
        dev.groupBy("l_returnflag")
        .agg(F.first("med").alias("med"), F.percentile("dev", 0.5).alias("mad"))
        .withColumn("fence", F.lit(MAD_K) * F.col("mad"))
    )
    return (
        li.join(F.broadcast(fences), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("med").alias("median_cents"),
            F.first("mad").alias("mad_cents"),
            F.sum(
                F.when(F.abs(F.col("p") - F.col("med")) > F.col("fence"), 1)
                .otherwise(0)
            ).alias("n_outliers"),
        )
        .withColumn(
            "outlier_share",
            F.col("n_outliers").cast("double") / F.col("n").cast("double"),
        )
    )


PRICE_OUTLIERS_MAD_SQL = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p
  FROM lineitem
),
med AS (
  SELECT l_returnflag, quantile_cont(p, 0.5) AS med
  FROM base GROUP BY l_returnflag
),
fences AS (
  SELECT b.l_returnflag, MIN(m.med) AS med,
         quantile_cont(ABS(b.p - m.med), 0.5) AS mad
  FROM base b JOIN med m USING (l_returnflag)
  GROUP BY b.l_returnflag
)
SELECT b.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(f.med) AS median_cents,
       MIN(f.mad) AS mad_cents,
       CAST(SUM(CASE WHEN ABS(b.p - f.med) > {MAD_K} * f.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN ABS(b.p - f.med) > {MAD_K} * f.mad
                     THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS outlier_share
FROM base b JOIN fences f USING (l_returnflag)
GROUP BY b.l_returnflag
"""


KS_CRIT_05 = 1.358  # two-sample Kolmogorov-Smirnov c(α) at α = 0.05


def ks_test_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: does the price distribution of
    returned lineitems (flag R) differ from non-returned (flag N)?  The
    standard nonparametric drift / A-B screen.

    D = sup |ECDF_R − ECDF_N| evaluated on the pooled distinct values.
    Exactness: the sup is maximized over |cum_R·n_N − cum_N·n_R| in
    decimal(38,0)/HUGEINT (overflow-safe: cum ≤ 1e12 rows ⇒ product
    ≤ 1e24 ≪ 1e38) and divided by n_R·n_N ONCE at the end; the critical
    value is literal·sqrt of a single exact ratio (sqrt is correctly
    rounded) — every float both engines compare is the identical
    expression over identical operands.

    Scale: one hash aggregate to per-value counts (domain-sized, ≪ rows),
    then the ECDFs via :func:`ranking.grouped_prefix_sums` — ONE range
    exchange for both running sums, no single-task global window — and a
    1-row max-reduce.  This is the distributed-KS shape that survives a
    value domain too large to collect.
    """
    from retail_sales_project_bigdata_spark.operators.ranking import (
        grouped_prefix_sums,
        with_total_count,
    )

    li = (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin("R", "N"))
        .select("l_returnflag", _cents("l_extendedprice").alias("p"))
    )
    per_val = li.groupBy("p").agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("c_r"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("c_n"),
    )
    cum = grouped_prefix_sums(
        per_val, [], [F.asc("p")], ["c_r", "c_n"], ["cum_r", "cum_n"]
    )
    tot = per_val.agg(
        F.sum("c_r").cast("long").alias("n_r"),
        F.sum("c_n").cast("long").alias("n_n"),
    )
    d_num = F.abs(
        F.col("cum_r").cast(_D38) * F.col("n_n").cast(_D38)
        - F.col("cum_n").cast(_D38) * F.col("n_r").cast(_D38)
    )
    agg = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n_r", "n_n")
        .agg(F.max(d_num).alias("d_num"))
    )
    d_stat = agg["d_num"].cast("double") / (
        F.col("n_r").cast("double") * F.col("n_n").cast("double")
    )
    crit = F.lit(KS_CRIT_05) * F.sqrt(
        (F.col("n_r") + F.col("n_n")).cast("double")
        / (F.col("n_r").cast("double") * F.col("n_n").cast("double"))
    )
    return agg.select(
        "n_r",
        "n_n",
        pround(d_stat, 6).alias("d_stat"),
        pround(crit, 6).alias("crit_05"),
        (d_stat > crit).cast("int").alias("reject_05"),
    )


KS_TEST_RETURNFLAG_SQL = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
),
per_val AS (
  SELECT p,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS c_r,
         SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS c_n
  FROM base GROUP BY p
),
cum AS (
  SELECT SUM(c_r) OVER (ORDER BY p) AS cum_r,
         SUM(c_n) OVER (ORDER BY p) AS cum_n
  FROM per_val
),
tot AS (
  SELECT CAST(SUM(c_r) AS BIGINT) AS n_r, CAST(SUM(c_n) AS BIGINT) AS n_n
  FROM per_val
),
m AS (
  SELECT t.n_r, t.n_n,
         MAX(ABS(CAST(c.cum_r AS HUGEINT) * t.n_n
                 - CAST(c.cum_n AS HUGEINT) * t.n_r)) AS d_num
  FROM cum c CROSS JOIN tot t
  GROUP BY t.n_r, t.n_n
)
SELECT n_r, n_n,
       ROUND(CAST(d_num AS DOUBLE)
             / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE)), 6) AS d_stat,
       ROUND({KS_CRIT_05} * SQRT(CAST(n_r + n_n AS DOUBLE)
             / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))), 6) AS crit_05,
       CAST(CAST(d_num AS DOUBLE)
              / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))
            > {KS_CRIT_05} * SQRT(CAST(n_r + n_n AS DOUBLE)
              / (CAST(n_r AS DOUBLE) * CAST(n_n AS DOUBLE))) AS INT)
         AS reject_05
FROM m
"""


def chi2_priority_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² test of independence: is order priority distributed the same
    across customer regions?  Per (region, priority) cell: observed
    count, expected count under independence, and the χ² contribution —
    the contingency-table screen behind "does segment X behave
    differently".

    Exactness: observed counts and the row/col/grand totals are exact
    integers; ``expected = row·col / total`` and the χ² term are computed
    as the identical double expression on both engines (row·col cast to
    double FIRST — two 1e12-scale totals overflow int64, the
    ADVICE-r1 multiply discipline).

    Scale: orders⋈customer is the only fact-side shuffle (customer is
    hint-broadcast when small; at 100 TB it shuffles on custkey);
    nation/region are broadcast dims; the contingency frame is
    |regions|×|priorities| (dozens of rows), so the totals windows run
    over a constant-size frame.
    """
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = read_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    row_tot = F.sum("n_obs").over(Window.partitionBy("r_name"))
    col_tot = F.sum("n_obs").over(Window.partitionBy("o_orderpriority"))
    grand = F.sum("n_obs").over(Window.partitionBy())
    expected = row_tot.cast("double") * col_tot.cast("double") / grand.cast(
        "double"
    )
    dev = F.col("n_obs").cast("double") - expected
    return cells.select(
        "r_name",
        "o_orderpriority",
        "n_obs",
        pround(expected, 6).alias("expected"),
        pround(dev * dev / expected, 6).alias("chi2_term"),
    )


CHI2_PRIORITY_REGION_SQL = """
WITH cells AS (
  SELECT r.r_name, o.o_orderpriority, COUNT(*) AS n_obs
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY r.r_name, o.o_orderpriority
),
t AS (
  SELECT r_name, o_orderpriority, n_obs,
         SUM(n_obs) OVER (PARTITION BY r_name) AS row_tot,
         SUM(n_obs) OVER (PARTITION BY o_orderpriority) AS col_tot,
         SUM(n_obs) OVER () AS grand
  FROM cells
)
SELECT r_name, o_orderpriority, n_obs,
       ROUND(CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
             / CAST(grand AS DOUBLE), 6) AS expected,
       ROUND((CAST(n_obs AS DOUBLE)
              - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                / CAST(grand AS DOUBLE))
             * (CAST(n_obs AS DOUBLE)
                - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                  / CAST(grand AS DOUBLE))
             / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
                / CAST(grand AS DOUBLE)), 6) AS chi2_term
FROM t
"""


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per returnflag: clamp prices to [p05, p95] and
    average — the outlier-robust location estimate feature pipelines use
    before standardization (clipping, not dropping, keeps n stable).

    Exactness: the clamped sum is decomposed as
    ``Σ(mid, exact integer) + n_lo·p05 + n_hi·p95`` — the two boundary
    products and two additions are the ONLY float ops before the single
    division, written in the same association on both engines (a
    row-wise SUM of clamped doubles would instead inherit the engines'
    differing accumulation orders).  Quantile interpolation positions
    follow the same engine-identical percentile formula the decile
    query established.

    Scale: two passes — a 3-group percentile aggregate (broadcast back),
    then one map-side-combinable aggregate; no shuffle wider than the
    3-row bounds join.
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", _cents("l_extendedprice").alias("p")
    )
    q = li.groupBy("l_returnflag").agg(
        F.percentile("p", WINSOR_LO).alias("lo"),
        F.percentile("p", WINSOR_HI).alias("hi"),
    )
    j = li.join(F.broadcast(q), "l_returnflag")
    agg = j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        F.sum(
            F.when(
                (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
                F.col("p"),
            ).otherwise(0)
        ).alias("sum_mid"),
        F.sum(F.when(F.col("p") < F.col("lo"), 1).otherwise(0)).alias("n_lo"),
        F.sum(F.when(F.col("p") > F.col("hi"), 1).otherwise(0)).alias("n_hi"),
    )
    wsum = (
        agg["sum_mid"].cast("double")
        + agg["n_lo"].cast("double") * agg["lo"]
    ) + agg["n_hi"].cast("double") * agg["hi"]
    return agg.select(
        "l_returnflag",
        "n",
        pround("lo", 6).alias("p05_cents"),
        pround("hi", 6).alias("p95_cents"),
        "n_lo",
        "n_hi",
        pround(wsum / agg["n"].cast("double"), 6).alias("winsorized_mean_cents"),
    )


WINSORIZED_PRICE_STATS_SQL = f"""
WITH base AS (
  SELECT l_returnflag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS p
  FROM lineitem
),
q AS (
  SELECT l_returnflag,
         quantile_cont(p, {WINSOR_LO}) AS lo,
         quantile_cont(p, {WINSOR_HI}) AS hi
  FROM base GROUP BY l_returnflag
),
a AS (
  SELECT b.l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         MIN(q.lo) AS lo, MIN(q.hi) AS hi,
         SUM(CASE WHEN b.p >= q.lo AND b.p <= q.hi THEN b.p ELSE 0 END)
           AS sum_mid,
         CAST(SUM(CASE WHEN b.p < q.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
         CAST(SUM(CASE WHEN b.p > q.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi
  FROM base b JOIN q USING (l_returnflag)
  GROUP BY b.l_returnflag
)
SELECT l_returnflag, n,
       ROUND(lo, 6) AS p05_cents,
       ROUND(hi, 6) AS p95_cents,
       n_lo, n_hi,
       ROUND(((CAST(sum_mid AS DOUBLE) + CAST(n_lo AS DOUBLE) * lo)
              + CAST(n_hi AS DOUBLE) * hi) / CAST(n AS DOUBLE), 6)
         AS winsorized_mean_cents
FROM a
"""


def theil_sen_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope of each nation's weekly revenue — the
    standard companion ESTIMATOR to the Mann-Kendall trend TEST
    (:func:`trend_mann_kendall`): the median of all pairwise slopes,
    insensitive to ~29% outliers where OLS is wrecked by one bad week.

    Exactness: revenue is exact integer cents, so every pairwise slope
    is ONE IEEE division of an exact BIGINT difference by an exact int
    week gap — engine-identical doubles (single-division rule).  The
    median picks the middle rank(s) explicitly (ties in slope VALUE are
    interchangeable, so the tie-broken rank is value-stable), and the
    even-count midpoint is one add + one halving — both exactly rounded
    identically in Spark and DuckDB.

    Scale: identical posture to Mann-Kendall — the pair join is over the
    per-nation WEEKLY aggregate, so the quadratic lives in the
    calendar-bounded time dimension, not the data volume.  EVERYTHING
    after the weekly aggregate is calendar-bounded (|nations| ×
    |weeks|², independent of fact-table size), which licenses two
    simplifications the fact-sized rankers cannot take (optimization
    round r9, guide §2.4/§3.1): the pair join BROADCASTS its right side
    (the weekly aggregate itself — a few thousand rows at any data
    scale), and the per-nation median rank uses a plain partitioned
    window (each nation's pair frame is ≤ weeks²/2 rows BY CALENDAR, so
    the one-task-per-group sort is bounded work, not a skew hazard).
    The former two-phase grouped ranking (range-bound sampling pass +
    persist + offsets join) was machinery sized for data-proportional
    strata; here it cost three extra exchanges.  n_pairs is n·(n−1)/2
    of the per-nation week count — arithmetic, not a second pass over
    the pair frame.
    """
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit(DAY_EPOCH)) + 1
    weekly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .withColumn("week_no", F.ceil(day / F.lit(7.0)).cast("int"))
        .groupBy("n_name", "week_no")
        .agg(F.sum(_cents("o_totalprice")).alias("rev"))
        .persist()  # two pair sides + the per-nation week count
    )
    a = weekly.select(
        "n_name", F.col("week_no").alias("w_i"), F.col("rev").alias("x_i")
    )
    b = weekly.select(
        "n_name", F.col("week_no").alias("w_j"), F.col("rev").alias("x_j")
    )
    pairs = (
        a.join(F.broadcast(b), "n_name")
        .filter(F.col("w_i") < F.col("w_j"))
        .select(
            "n_name",
            "w_i",
            "w_j",
            (
                (F.col("x_j") - F.col("x_i"))
                / (F.col("w_j") - F.col("w_i"))
            ).alias("slope"),
        )
    )
    ranked = pairs.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("n_name").orderBy(
                F.asc("slope"), F.asc("w_i"), F.asc("w_j")
            )
        ),
    )
    n_weeks = weekly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_weeks")
    )
    # n choose 2 of the week count — weekly is grouped by (nation, week),
    # so the pair frame has EXACTLY n·(n−1)/2 rows per nation; integer
    # div is exact (the product of consecutive ints is even).
    counts = n_weeks.select(
        "n_name",
        F.expr("n_weeks * (n_weeks - 1) div 2").alias("n_pairs"),
    )
    mid = ranked.join(F.broadcast(counts), "n_name").filter(
        (F.col("rk") == F.floor((F.col("n_pairs") + 1) / 2))
        | (F.col("rk") == F.floor((F.col("n_pairs") + 2) / 2))
    )
    sen = mid.groupBy("n_name", "n_pairs").agg(
        pround(F.avg("slope"), 6).alias("sen_slope_cents")
    )
    return (
        sen.join(F.broadcast(n_weeks), "n_name")
        .select("n_name", "n_weeks", "n_pairs", "sen_slope_cents")
    )


THEIL_SEN_WEEKLY_TREND_SQL = f"""
WITH weekly AS (
  SELECT n.n_name,
         CAST(CEIL((datediff('day', DATE '{DAY_EPOCH}',
                             CAST(o.o_orderdate AS DATE)) + 1) / 7.0)
              AS INT) AS week_no,
         CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
pairs AS (
  SELECT a.n_name, a.week_no AS w_i, b.week_no AS w_j,
         CAST(b.rev - a.rev AS DOUBLE) / (b.week_no - a.week_no) AS slope
  FROM weekly a JOIN weekly b
    ON a.n_name = b.n_name AND a.week_no < b.week_no
),
ranked AS (
  SELECT n_name, slope,
         ROW_NUMBER() OVER (
             PARTITION BY n_name ORDER BY slope, w_i, w_j) AS rk
  FROM pairs
),
counts AS (
  SELECT n_name, COUNT(*) AS n_pairs FROM pairs GROUP BY 1
),
wk AS (
  SELECT n_name, COUNT(*) AS n_weeks FROM weekly GROUP BY 1
)
SELECT r.n_name, wk.n_weeks, c.n_pairs,
       ROUND(AVG(r.slope), 6) AS sen_slope_cents
FROM ranked r
JOIN counts c ON r.n_name = c.n_name
JOIN wk ON r.n_name = wk.n_name
WHERE r.rk = CAST(floor((c.n_pairs + 1) / 2.0) AS BIGINT)
   OR r.rk = CAST(floor((c.n_pairs + 2) / 2.0) AS BIGINT)
GROUP BY r.n_name, wk.n_weeks, c.n_pairs
"""


ORACLES: dict[str, str] = {
    "theil_sen_weekly_trend": THEIL_SEN_WEEKLY_TREND_SQL,
    "price_outliers_mad": PRICE_OUTLIERS_MAD_SQL,
    "ks_test_returnflag": KS_TEST_RETURNFLAG_SQL,
    "chi2_priority_region": CHI2_PRIORITY_REGION_SQL,
    "winsorized_price_stats": WINSORIZED_PRICE_STATS_SQL,
    "benford_price_audit": BENFORD_PRICE_AUDIT_SQL,
    "trend_mann_kendall": TREND_MANN_KENDALL_SQL,
    "revenue_anomalies": REVENUE_ANOMALIES_SQL,
    "price_decile_assignments": PRICE_DECILE_ASSIGNMENTS_SQL,
    "order_gap_stats": ORDER_GAP_STATS_SQL,
    "sales_stats_by_flag": SALES_STATS_BY_FLAG_SQL,
    "price_outliers_iqr": PRICE_OUTLIERS_IQR_SQL,
    "quantity_central_tendency": QUANTITY_CENTRAL_TENDENCY_SQL,
}

QUERIES = {
    "theil_sen_weekly_trend": theil_sen_weekly_trend,
    "price_outliers_mad": price_outliers_mad,
    "ks_test_returnflag": ks_test_returnflag,
    "chi2_priority_region": chi2_priority_region,
    "winsorized_price_stats": winsorized_price_stats,
    "benford_price_audit": benford_price_audit,
    "trend_mann_kendall": trend_mann_kendall,
    "revenue_anomalies": revenue_anomalies,
    "price_decile_assignments": price_decile_assignments,
    "order_gap_stats": order_gap_stats,
    "sales_stats_by_flag": sales_stats_by_flag,
    "price_outliers_iqr": price_outliers_iqr,
    "quantity_central_tendency": quantity_central_tendency,
}
