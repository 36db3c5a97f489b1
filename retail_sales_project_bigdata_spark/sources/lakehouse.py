"""Lakehouse connectors (Delta / Iceberg / Hudi) — gated stubs.

The table-format jars are not on this image's classpath (guide: "Delta/
Iceberg/Hudi need their jars — stub connectors behind an import-try").
Each reader/writer probes for its integration at call time and raises an
actionable error otherwise; when the jar+package are present the same
call works unchanged, so downstream code can target these today.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class ConnectorUnavailable(NotImplementedError):
    """The table-format integration is not installed on this cluster."""


def _require(module: str, fmt: str, hint: str) -> None:
    import importlib

    try:
        importlib.import_module(module)
    except ImportError as e:  # pragma: no cover - format jars not in image
        raise ConnectorUnavailable(
            f"{fmt} support is not installed: {e}. {hint}"
        ) from e


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    _require(
        "delta",
        "Delta Lake",
        "Add delta-spark to requirements and io.delta:delta-spark jars via "
        "spark.jars.packages.",
    )
    return spark.read.format("delta").load(path)  # pragma: no cover


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    _require(
        "delta",
        "Delta Lake",
        "Add delta-spark to requirements and io.delta:delta-spark jars via "
        "spark.jars.packages.",
    )
    df.write.format("delta").mode(mode).save(path)  # pragma: no cover


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as e:  # pragma: no cover - catalog not configured
        raise ConnectorUnavailable(
            f"Iceberg support is not configured: {e}. Add "
            "org.apache.iceberg:iceberg-spark-runtime via spark.jars.packages "
            "and a spark.sql.catalog.<name> configuration."
        ) from e


def read_jdbc(
    spark: SparkSession, url: str, dbtable: str, **options: str
) -> DataFrame:
    """JDBC source (works out of the box given a driver jar) — predicate
    pushdown and partitioned reads via the standard options
    (partitionColumn/lowerBound/upperBound/numPartitions)."""
    reader = spark.read.format("jdbc").option("url", url).option(
        "dbtable", dbtable
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as e:
        raise ConnectorUnavailable(
            f"JDBC load failed (driver jar on classpath?): {e}"
        ) from e
