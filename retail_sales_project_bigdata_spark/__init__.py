"""retail_sales_project_bigdata_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query semantics of the
reference repo ``adwaiths05/retail-sales-project-bigdata`` (six Spark driver
programs over the Dunnhumby retail dataset: ETL preprocessing, churn
labeling + RandomForest, KMeans segmentation, ALS recommendation, FP-Growth
basket analysis, top-products reporting), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, streaming
windows) layered on top.

Design principles (see SURVEY.md §7):
- DataFrame/SQL only — declare logical plans, let Catalyst/Tungsten pick
  physical strategies.  No RDDs anywhere.
- Explicit schemas (no inferSchema double-scans), broadcast hints for
  dimension tables, AQE on, decimal-stable aggregates for oracle parity.
- Python UDFs only where built-ins genuinely can't express the semantics
  (Arrow-batched pandas UDFs, never row-at-a-time).
"""

__version__ = "0.1.0"

from retail_sales_project_bigdata_spark.session import get_spark  # noqa: F401
