"""Unit tests for the scalar function surface (FIXTURES.md §C edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import (
    day_of_week,
    safe_div,
    stable_avg,
    stable_sum,
    week_no,
)


def test_week_no_boundaries(spark):
    df = spark.createDataFrame([(1,), (7,), (8,), (14,), (15,)], ["day"])
    rows = df.select("day", week_no("day").alias("w")).orderBy("day").collect()
    assert [(r.day, r.w) for r in rows] == [(1, 1), (7, 1), (8, 2), (14, 2), (15, 3)]


def test_day_of_week_cycles(spark):
    df = spark.createDataFrame([(1,), (7,), (8,)], ["day"])
    rows = df.select("day", day_of_week("day").alias("d")).orderBy("day").collect()
    assert [(r.day, r.d) for r in rows] == [(1, 1), (7, 7), (8, 1)]


def test_safe_div_zero_denominator(spark):
    # FIXTURES.md §C.1: quantity = 0 rows must not produce null/inf
    df = spark.createDataFrame([(10.0, 2.0), (10.0, 0.0)], ["num", "den"])
    rows = (
        df.select(safe_div(F.col("num"), F.col("den")).alias("q"))
        .orderBy(F.desc("q"))
        .collect()
    )
    assert [r.q for r in rows] == [5.0, 0.0]


def test_stable_sum_and_avg(spark):
    df = spark.createDataFrame([(1.105,), (2.205,), (3.305,)], ["x"])
    row = df.agg(
        stable_sum("x").alias("s"), stable_avg("x", 3).alias("a")
    ).first()
    assert row.s == 6.615
    assert row.a == 2.205


def test_stable_sum_ignores_partitioning(spark):
    data = [(float(i) * 0.01,) for i in range(1, 2001)]
    a = spark.createDataFrame(data, ["x"]).repartition(1)
    b = spark.createDataFrame(data, ["x"]).repartition(16)
    assert a.agg(stable_sum("x")).first()[0] == b.agg(stable_sum("x")).first()[0]


def test_doc_repetition_stats_single_token_docs(spark, tmp_path):
    """A one-token document has no bigrams — the left-join null path must
    produce 0.0 fractions, not nulls or division errors."""
    import os

    from retail_sales_project_bigdata_spark.operators.textstats import (
        doc_repetition_stats,
    )

    rows = [
        (1, "hello", "en", "web", 5),
        (2, "a a a a", "en", "web", 7),
        (3, "x y x y", "en", "web", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(os.path.join(sf_dir, "documents.parquet"))
    got = {
        r.doc_id: r for r in doc_repetition_stats(spark, sf_dir).collect()
    }
    assert got[1].n_tokens == 1
    assert got[1].top_bigram_frac == 0.0
    assert got[1].dup_bigram_frac == 0.0
    assert got[1].is_repetitive == 0
    # "a a a a": one distinct token, one distinct bigram repeated 3x
    assert got[2].distinct_token_ratio == 0.25
    assert got[2].top_bigram_frac == 1.0
    assert got[2].is_repetitive == 1
    # "x y x y": bigrams x_y, y_x, x_y -> top share 2/3
    assert abs(got[3].top_bigram_frac - round(2 / 3, 6)) < 1e-9
