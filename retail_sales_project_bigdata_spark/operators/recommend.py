"""Product recommendation (SURVEY §2.4 A8, §2.11 M2, §2.3 J8).

Re-expresses ``ProductRecommendation.java``: implicit ratings =
``sum(SALES_VALUE)`` per (household, product) (``:49-50``), ALS with
maxIter 10 / regParam 0.1 / implicitPrefs / coldStartStrategy drop
(``:53-62``), ``recommendForAllUsers(5)`` flattened via explode + struct
field access (``:65-69``), joined to product names (``:71-72``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import (
    net_sales,
    oracle_sum,
    stable_sum,
)
from retail_sales_project_bigdata_spark.sources import read_table

ALS_MAX_ITER = 10  # ProductRecommendation.java:53-62
ALS_REG_PARAM = 0.1
ALS_TOP_K = 5
ALS_SEED = 42


def ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: implicit rating = total spend per (household, product)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", net_sales().alias("net_sales")
    )
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(stable_sum("net_sales").alias("rating"))
    )


RATINGS_SQL = f"""
SELECT o.o_custkey AS custkey, l.l_partkey AS partkey,
       {oracle_sum('l.l_extendedprice * (1.0 - l.l_discount)')} AS rating
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_custkey, l.l_partkey
"""


def als_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2 + O4 + J8: ALS top-5 per user, exploded and joined to part names.

    ``recommendForAllUsers`` returns ``array<struct<partkey,rating>>`` —
    flattened exactly like ProductRecommendation.java:65-69 (explode +
    ``col("rec.PRODUCT_ID")``-style struct access).  Rows-only check:
    factorization is seeded but engine-version-sensitive; tests assert
    exactly K recs per user with descending scores.
    """
    from pyspark.ml.recommendation import ALS

    base = ratings(spark, sf_dir)
    # ALS requires int32 ids.  A raw cast past 2^31 either throws under
    # ANSI mode or silently WRAPS (merging different customers' ratings)
    # without it — fail loudly with the remediation instead: key spaces
    # that outgrow int32 need a contiguous index mapping
    # (zipWithIndex / dense rank) built once and joined back after
    # recommendation.
    max_key = base.agg(
        F.greatest(F.max("custkey"), F.max("partkey"))
    ).first()[0]
    if max_key is not None and max_key > 2**31 - 1:
        raise ValueError(
            f"ALS ids must fit int32; max key {max_key} exceeds 2^31-1 — "
            "build a contiguous index mapping for custkey/partkey first"
        )
    r = base.select(
        F.col("custkey").cast("int").alias("user"),
        F.col("partkey").cast("int").alias("item"),
        F.col("rating").cast("float").alias("rating"),
    )
    als = ALS(
        maxIter=ALS_MAX_ITER,
        regParam=ALS_REG_PARAM,
        implicitPrefs=True,
        coldStartStrategy="drop",
        seed=ALS_SEED,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
    )
    model = als.fit(r)
    recs = model.recommendForAllUsers(ALS_TOP_K)
    flat = recs.select(
        F.col("user").alias("custkey"),
        F.explode("recommendations").alias("rec"),
    ).select(
        "custkey",
        F.col("rec.item").alias("partkey"),
        F.col("rec.rating").alias("score"),
    )
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("int").alias("partkey"), "p_name"
    )
    return flat.join(part, "partkey", "inner").select(
        "custkey", "partkey", "p_name", "score"
    )


ORACLES: dict[str, str] = {
    "ratings": RATINGS_SQL,
    # als_recommendations: rows-only (seeded ALS, engine-version-sensitive)
}

QUERIES = {
    "ratings": ratings,
    "als_recommendations": als_recommendations,
}
