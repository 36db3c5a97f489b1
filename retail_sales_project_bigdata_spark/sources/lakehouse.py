"""Lakehouse-format connectors (Delta / Iceberg), import-gated.

Neither format's jars ship in this environment, so these wrappers probe
for the integration at call time and fail with an actionable message
instead of a JVM ClassNotFound stack.  The engine-side SEMANTICS the
formats provide are implemented natively elsewhere and tested:

- snapshot/version isolation + time travel → ``sources.publish_versioned``
  / ``read_versioned`` (atomic manifest swap);
- MERGE INTO → ``operators.cdc.merge_upsert`` (full-outer + coalesce);
- CDC compaction → ``operators.cdc.latest_order_per_customer``;
- Z-ORDER data layout → ``sources.zorder_cluster_parquet``;
- exactly-once streaming upsert → ``streaming.stream_cdc_upsert_parquet``.

So adopting a real lakehouse format is a sink swap, not an engine
rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DELTA_HINT = (
    "Delta Lake support requires the delta-spark package and its jars "
    "(spark.jars.packages=io.delta:delta-spark_2.13:<ver>, plus the "
    "DeltaCatalog session extensions). Install them and re-run; the "
    "native fallback is sources.publish_versioned."
)

_ICEBERG_HINT = (
    "Apache Iceberg support requires the iceberg-spark-runtime jar and a "
    "catalog config (spark.sql.catalog.<name>=org.apache.iceberg.spark."
    "SparkCatalog). Install them and re-run; the native fallback is "
    "sources.publish_versioned."
)


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def write_delta(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Delta sink (needs delta-spark on the classpath)."""
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    df.write.format("delta").mode(mode).save(path)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    return spark.read.format("delta").load(path)


def iceberg_available(spark: SparkSession) -> bool:
    # py4j returns a JavaPackage (no exception) for missing classes —
    # probe through Class.forName, which genuinely throws when the jar
    # is absent.
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


def write_iceberg(df: DataFrame, table: str, mode: str = "overwrite") -> None:
    """Iceberg sink (needs the runtime jar + a configured catalog).
    ``mode``: 'overwrite' → createOrReplace, 'append' → append."""
    if not iceberg_available(df.sparkSession):
        raise NotImplementedError(_ICEBERG_HINT)
    writer = df.writeTo(table).using("iceberg")
    if mode == "overwrite":
        writer.createOrReplace()
    elif mode == "append":
        writer.append()
    else:
        raise ValueError(f"unsupported iceberg write mode: {mode!r}")
