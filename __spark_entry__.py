"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship RFM+demographics query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ north-star
training-data ops), one callable per name: ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
genuinely non-SQL-expressible ops: ML models, LSH with engine-specific
hashes, streaming state — the driver records rows-only checks for those).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from retail_sales_project_bigdata_spark import streaming as streaming_mod
from retail_sales_project_bigdata_spark.ml import pipelines as ml_pipelines
from retail_sales_project_bigdata_spark.operators import (
    asof,
    baskets,
    calendar as calendar_mod,
    cdc,
    churn,
    cleaning,
    curation,
    datasetops,
    expectations,
    dedup,
    dunnhumby,
    funnel,
    graph,
    multimodal,
    olap,
    rangejoin,
    recommend,
    reports,
    rfm,
    segmentation,
    sessions,
    similarity,
    skew,
    stats,
    temporal,
    textstats,
    tpch_shapes,
    tpch_shapes3,
)

_MODULES = [
    cleaning,
    dunnhumby,
    rfm,
    temporal,
    churn,
    reports,
    baskets,
    recommend,
    segmentation,
    textstats,
    dedup,
    datasetops,
    curation,
    expectations,
    similarity,
    sessions,
    multimodal,
    olap,
    funnel,
    graph,
    stats,
    calendar_mod,
    asof,
    skew,
    cdc,
    rangejoin,
    tpch_shapes,
    tpch_shapes3,
    streaming_mod,
]

# ML model queries (rows-only by nature)
_EXTRA_QUERIES = {
    "churn_model_metrics": ml_pipelines.churn_model_metrics,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return rfm.rfm_demographics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    out.update(_EXTRA_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
