"""profile_df/profile_query: runtime + plan profile fields are present
and consistent."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_profile_query_fields(spark):
    from retail_sales_project_bigdata_spark.profiling import profile_query

    prof = profile_query(spark, "rfm", SF_SMALL)
    assert prof["label"] == "rfm"
    assert prof["wall_sec"] > 0
    assert prof["jobs"] >= 1
    assert prof["stages"] >= 1
    assert prof["tasks"] >= 1
    assert prof["failed_tasks"] == 0
    assert prof["python_eval_nodes"] == 0  # rfm is fully relational
    assert prof["codegen_spans"] >= 1

    with pytest.raises(KeyError):
        profile_query(spark, "no_such_query", SF_SMALL)


def test_profile_counts_python_stage(spark):
    from retail_sales_project_bigdata_spark.profiling import profile_query

    prof = profile_query(spark, "ann_mmr_topk", SF_SMALL)
    assert prof["python_eval_nodes"] >= 1  # the applyInPandas rerank
    assert prof["failed_tasks"] == 0
