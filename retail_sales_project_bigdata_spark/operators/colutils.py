"""Column-handling utilities (SURVEY §2.2 P1, P4-P6, P17).

The reference's defensive column plumbing, re-expressed:

- P1: bulk standardize names — the reference loops ``withColumnRenamed``
  (FullPreprocessingPipeline.java:52-55) creating O(cols) nested
  projections; the rebuild uses a single ``toDF`` (§4.3.7 fix).
- P17: defensive column resolution — probing ``product_id`` vs
  ``product_id_x``/``_y`` (``:137-145``) and case-insensitive matching
  (MarketBasketAnalysis.java:101-117) as plain Python over ``df.columns``.
- P5/P6: null-imputation helpers with the reference's fill lists shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def standardize_columns(df: DataFrame) -> DataFrame:
    """P1: lowercase + spaces→underscores for every column, single
    projection (one ``toDF``, not a rename loop)."""
    return df.toDF(*[c.lower().replace(" ", "_") for c in df.columns])


def resolve_column(df: DataFrame, *candidates: str) -> str | None:
    """P17: first case-insensitively matching column among candidates —
    the ``product_id`` / ``product_id_x`` / ``product_id_y`` probe."""
    lower = {c.lower(): c for c in df.columns}
    for cand in candidates:
        if cand.lower() in lower:
            return lower[cand.lower()]
    return None


def fill_numeric(df: DataFrame, cols: list[str], value: float = 0.0) -> DataFrame:
    """P5: numeric imputation restricted to columns actually present
    (the reference retainAll's fill lists against df.columns,
    FullPreprocessingPipeline.java:189-193)."""
    present = [c for c in cols if c in df.columns]
    return df.na.fill(value, subset=present) if present else df


def fill_categorical(
    df: DataFrame, cols: list[str], value: str = "UNKNOWN"
) -> DataFrame:
    """P6: categorical imputation ("UNKNOWN"), present-columns only."""
    present = [c for c in cols if c in df.columns]
    return df.na.fill(value, subset=present) if present else df


def drop_all_null_columns(df: DataFrame) -> DataFrame:
    """P16 follow-through: drop columns whose non-null count is 0, found in
    ONE aggregation job (vs. the reference's per-column scan loop,
    FullPreprocessingPipeline.java:103-113)."""
    from pyspark.sql import functions as F

    counts = df.agg(
        *[F.count(F.col(f"`{c}`")).alias(c) for c in df.columns]
    ).first()
    dead = [c for c in df.columns if counts[c] == 0]
    return df.drop(*dead) if dead else df
