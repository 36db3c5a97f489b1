"""Operator modules (SURVEY §2 inventory → PySpark re-expression).

Each module exposes query callables with signature
``(spark: SparkSession, sf_dir: str) -> DataFrame`` plus an ``ORACLES``
dict mapping query name → equivalent DuckDB SQL (ANSI) over the same
parquet tables.  ``__spark_entry__.py`` aggregates them for the driver.
"""
