"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop sink (full execution, no driver
transfer, no output I/O) — measures the compute+shuffle cost the cluster
would pay.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from retail_sales_project_bigdata_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Iterative ML model training (M1-M5) is excluded from the throughput
# benchmark: those queries measure MLlib convergence, not engine execution
# (they run under tests/test_ml.py property checks instead).  Set
# SPARK_GRAFT_BENCH_ML=1 to include them.
ML_TRAINING_QUERIES = {
    "als_recommendations",
    "kmeans_sweep",
    "segment_assignments",
    "churn_model_metrics",
    "fpgrowth_itemsets",
}


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def warmup(spark) -> None:
    """One small end-to-end job before timing: JVM JIT, codegen compiler,
    shuffle machinery, and the parquet footer cache all initialize here
    instead of inside whichever query sorts first alphabetically."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(SF_DIR, "region.parquet"))
    materialize(
        df.crossJoin(F.broadcast(df.select(F.col("r_regionkey").alias("k"))))
        .groupBy("k")
        .count()
    )
    # Fork the Python worker pool + Arrow serialization path once, and
    # trigger the heavy imports (numpy/pandas) inside every worker, so the
    # first mapInPandas query measures compute, not 32x import cost.
    def _warm_imports(batches):
        import numpy  # noqa: F401  (worker-side import warmup)
        import pandas  # noqa: F401

        yield from batches

    materialize(
        spark.range(32, numPartitions=32).mapInPandas(
            _warm_imports, schema="id long"
        )
    )


def main() -> None:
    spark = get_spark("bench")
    warmup(spark)
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    queries = entrymod.queries()
    if not os.environ.get("SPARK_GRAFT_BENCH_ML"):
        queries = {
            k: v for k, v in queries.items() if k not in ML_TRAINING_QUERIES
        }

    timings: dict[str, float] = {}
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        materialize(fn(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
