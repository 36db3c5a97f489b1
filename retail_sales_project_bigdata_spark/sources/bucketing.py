"""Bucketed tables — shuffle-free co-located joins (guide: "Bucketing:
``bucketBy`` so later joins on the key co-locate without a shuffle").

At 100 TB, a fact-fact join (lineitem ⋈ orders on orderkey) shuffles both
sides every query.  Bucketing both tables on the join key at write time
moves that shuffle to ingestion: every subsequent join reads co-located
buckets and compiles to a SortMergeJoin with NO Exchange on either side
(verified in tests/test_bucketing.py by plan inspection).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables — Catalyst detects matching bucket
    specs and elides both shuffle exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
