"""Scale-safe global ordering primitives (VERDICT r1 item 1).

A global window (``Window.orderBy(...)`` with no partitionBy) compiles to
a single-partition WindowExec: ONE task sorts and scans the entire frame
— the "one task owns the whole frame" shape that dies first at 100 TB
(Spark itself warns ``WindowExec: No Partition Defined``).  The
reference's ranking steps (ntile scoring, percent_rank reports, dense id
assignment) all used that shape; this module replaces it with the
two-phase formulation:

1. ``repartitionByRange`` on the order key — Spark's distributed sort:
   every partition holds a contiguous key range, partitions are ordered.
2. A *partitioned* ``row_number`` per range partition (parallel).
3. Per-partition row counts → prefix-sum offsets.  The offsets frame is
   (#partitions)-sized — broadcast it and add ``offset + local_rn``.

The result equals the global ``row_number()`` EXACTLY **when the ordering
is total** (no ties across the full key) — which every caller here
guarantees by appending a unique key as the final tiebreak, the same
discipline that already made NTILE/percent_rank deterministic and
engine-portable for the DuckDB oracles.  Under a unique ordering,
``rank == dense_rank == row_number``, so percent_rank, cume_dist and
ntile are all pure arithmetic on (row_number, total_count):

- ``percent_rank = (rn - 1) / (n - 1)``  (0 when n == 1, per SQL spec)
- ``cume_dist    = rn / n``
- ``ntile(t)``: with ``q = n div t`` and ``rem = n mod t``, the first
  ``rem`` tiles take ``q + 1`` rows, the rest take ``q`` — closed form
  below, identical to Spark's and DuckDB's NTILE.

Cost: one range exchange + one hash exchange on the partition id (both
distributed) versus the single-task sort — strictly better past a few
million rows, and the only formulation that survives a frame that grows
with the business (customers, suppliers, vocabulary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based global row number under a TOTAL ordering, no global window.

    ``order_cols`` must define a unique ordering (append a key column as
    the last sort term); ties straddling a range boundary would otherwise
    make the local row numbers order-dependent.

    Plan shape: RangeExchange(order) → partitioned WindowExec(local rn)
    → tiny count-per-partition aggregate → broadcast prefix-sum join.
    The range exchange is computed once and reused by both consumers
    (ReuseExchange); the offsets side is (#partitions) rows.
    """
    spark = df.sparkSession
    n_part = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    ranged = df.repartitionByRange(n_part, *order_cols).withColumn(
        "_rr_pid", F.spark_partition_id()
    )
    local = ranged.withColumn(
        "_rr_local",
        F.row_number().over(
            Window.partitionBy("_rr_pid").orderBy(*order_cols)
        ),
    )
    counts = local.groupBy("_rr_pid").agg(F.count(F.lit(1)).alias("_rr_cnt"))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(
            F.broadcast(b),
            F.col("b._rr_pid") < F.col("a._rr_pid"),
            "left",
        )
        .groupBy(F.col("a._rr_pid").alias("_rr_pid"))
        .agg(F.coalesce(F.sum("b._rr_cnt"), F.lit(0)).alias("_rr_offset"))
    )
    return (
        local.join(F.broadcast(offsets), "_rr_pid")
        .withColumn(out, (F.col("_rr_local") + F.col("_rr_offset")).cast("long"))
        .drop("_rr_pid", "_rr_local", "_rr_offset")
    )


def with_total_count(df: DataFrame, out: str = "_n_total") -> DataFrame:
    """Attach the frame's total row count as a column — 1-row aggregate
    broadcast back via crossJoin (stays lazy, no driver round-trip)."""
    total = df.agg(F.count(F.lit(1)).cast("long").alias(out))
    return df.crossJoin(F.broadcast(total))


def ntile_from_rn(rn: Column, n: Column, tiles: int) -> Column:
    """Exact NTILE(tiles) from a total-order row number and total count.

    Matches Spark/DuckDB NTILE bucket boundaries: first ``n % tiles``
    buckets get ``n div tiles + 1`` rows each, the rest get ``n div
    tiles``.  Integer arithmetic via floor is exact below 2^53 rows.
    ``greatest(q, 1)`` keeps the (never-taken when q == 0) otherwise
    branch from dividing by zero under ANSI.
    """
    t = F.lit(tiles)
    q = F.floor(n / t)
    rem = n - q * t
    cut = rem * (q + 1)
    big = F.floor((rn - F.lit(1)) / (q + F.lit(1))) + F.lit(1)
    small = rem + F.floor((rn - cut - F.lit(1)) / F.greatest(q, F.lit(1))) + F.lit(1)
    return F.when(rn <= cut, big).otherwise(small).cast("int")


def percent_rank_from_rn(rn: Column, n: Column) -> Column:
    """percent_rank under a unique ordering: (rn-1)/(n-1), 0 for n == 1.
    Pure integer→IEEE-double ratio — bit-identical across engines."""
    return F.when(n == 1, F.lit(0.0)).otherwise(
        (rn - F.lit(1)).cast("double") / (n - F.lit(1)).cast("double")
    )


def cume_dist_from_rn(rn: Column, n: Column) -> Column:
    """cume_dist under a unique ordering: rn/n (peers == 1)."""
    return rn.cast("double") / n.cast("double")
