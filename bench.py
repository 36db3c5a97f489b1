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
    "quality_classifier_scores",
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

    # VM timing noise is ±20% on single totals (BASELINE.md) — support
    # median-of-N runs; the driver's default stays one run per budget.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")))
    per_run: list[dict[str, float]] = []
    for _ in range(n_runs):
        timings: dict[str, float] = {}
        for name, fn in sorted(queries.items()):
            t0 = time.perf_counter()
            materialize(fn(spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
            # Queries persist multi-consumer frames for WITHIN-action
            # reuse; nothing is shared ACROSS queries, so dropping the
            # cache here bounds executor memory over the 170+-query set
            # (accumulated persists previously drove multi-pass runs
            # into GCLocker death at sf0.1).
            spark.catalog.clearCache()
        per_run.append(timings)
        # Memo sharing between the queries of ONE run is engine design
        # (bpe pair, triangle pair, segmentation sweep); carrying memos
        # into the NEXT run would report cache-hit times as medians.
        from retail_sales_project_bigdata_spark.registry import (
            clear_session_memos,
        )

        clear_session_memos()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2.0

    timings = {
        name: round(median([r[name] for r in per_run]), 3)
        for name in per_run[0]
    }
    totals = [round(sum(r.values()), 3) for r in per_run]
    total = round(median(totals), 3)
    payload = {
        "metric": "query_set_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        "runs": n_runs,
        "run_totals": totals,
        "protocol": (
            f"median of {n_runs} full-set run(s), noop sink, warmed JVM; "
            "per-query values are per-name medians"
        ),
    }
    line = json.dumps(payload, separators=(",", ":"))
    # Full payload (all per-query medians) goes to disk; stdout gets a
    # SHORT line.  The driver's stdout capture keeps only a ~4 KB tail,
    # so round 1's full 150+-query line arrived decapitated and recorded
    # parsed=null (VERDICT r1 item 3: "keep the stdout line minimal
    # (summary + path)").  The short line carries the headline metric
    # plus the slowest queries; everything else is in queries_file.
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    summary = dict(
        payload,
        queries=slowest,
        n_queries=len(timings),
        queries_truncated_to="10 slowest; full set in queries_file",
        queries_file=out_path,
    )
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
