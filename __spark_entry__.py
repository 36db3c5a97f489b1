"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship RFM+demographics query at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ north-star
training-data ops), one callable per name: ``(spark, sf_dir) -> DataFrame``.
``oracle_sql()`` — matching DuckDB SQL per query (omitted only for
genuinely non-SQL-expressible ops: ML models, LSH with engine-specific
hashes, streaming state — the driver records rows-only checks for those).

Thin shim over ``retail_sales_project_bigdata_spark.registry`` — the
package-internal registry the CLI and library users share.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession

from retail_sales_project_bigdata_spark import registry
from retail_sales_project_bigdata_spark.operators import rfm


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return rfm.rfm_demographics(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
