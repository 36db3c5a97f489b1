"""Expectations engine: oracle parity for the report and quarantine
queries, split-semantics invariants, and null handling (a NULL condition
must count as a violation, per SQL constraint semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL, assert_oracle_match


def test_expectations_report_oracle(spark, duck):
    from retail_sales_project_bigdata_spark.operators.expectations import (
        EXPECTATIONS_REPORT_ALL_SQL,
        expectations_report_all,
    )

    df = expectations_report_all(spark, SF_SMALL)
    assert_oracle_match(df, duck, EXPECTATIONS_REPORT_ALL_SQL)
    rows = df.collect()
    assert len(rows) == 10  # 6 lineitem + 4 documents rules
    # the suites are chosen to have REAL violation mass, not tautologies
    assert any(r["n_violations"] > 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_violations"] <= r["n_rows"]
        assert abs(r["violation_rate"] - r["n_violations"] / r["n_rows"]) < 1e-15


def test_documents_quarantine_oracle(spark, duck):
    from retail_sales_project_bigdata_spark.operators.expectations import (
        DOCUMENTS_QUARANTINE_SQL,
        documents_quarantine,
    )

    df = documents_quarantine(spark, SF_SMALL)
    assert_oracle_match(df, duck, DOCUMENTS_QUARANTINE_SQL)
    for r in df.collect():
        assert r["violations"]  # every quarantined row names its rules


def test_split_and_null_semantics(spark):
    from retail_sales_project_bigdata_spark.operators.expectations import (
        apply_expectations,
        split_quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -1.0), (3, None)], "id int, v double"
    )
    annotated = apply_expectations(
        df, [("v_positive", F.col("v") > 0), ("v_le_5", F.col("v") <= 5)]
    )
    got = {r["id"]: r["violations"] for r in annotated.collect()}
    # NULL comparison is "not TRUE" -> violation of BOTH rules, in order
    assert got == {1: "v_le_5", 2: "v_positive", 3: "v_positive,v_le_5"}

    good, bad = split_quarantine(annotated)
    assert [r["id"] for r in good.collect()] == []
    assert sorted(r["id"] for r in bad.collect()) == [1, 2, 3]

    clean = apply_expectations(df, [("always", F.lit(True))])
    good, bad = split_quarantine(clean)
    assert sorted(r["id"] for r in good.collect()) == [1, 2, 3]
    assert bad.count() == 0
