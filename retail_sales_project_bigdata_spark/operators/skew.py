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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


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
