"""Local replica of the driver's correctness gate.

Runs each ``queries()[name]`` on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values.  Use while iterating so the per-round
CORRECTNESS gate holds no surprises.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Rows-only queries whose OUTPUT changes under gate mode (shrunk k-sweep,
# 1-point CV grid, smaller maxIter — see session.gate_mode call sites):
# their printed row counts here must not be read as production values.
GATE_MODE_SENSITIVE = {
    "als_recommendations",
    "kmeans_sweep",
    "segment_assignments",
    "churn_model_metrics",
    "quality_classifier_scores",
}


def _fast_equal(s_pdf, d_pdf) -> bool | None:
    """Vectorized multiset equality: serialize each row to one string —
    float64 columns via their RAW BITS (so the check is exactly as strict
    as the repr() path: ±0.0 differ, every ulp differs), everything else
    via str() — then compare the sorted serializations.  Returns None
    (undecidable → use the slow path) when a column holds lists/arrays
    or engine dtypes disagree in a way str() may mask."""
    import numpy as np

    if len(s_pdf) == 0:
        # caller verified equal row counts, so both are empty — decided.
        # (Also dodges numpy's empty-array char ops, which come back
        # float64 and poison the string pipeline below.)
        return True

    def rows(pdf):
        cols = []
        for c in pdf.columns:
            col = pdf[c]
            if col.dtype == "float64":
                cols.append(
                    np.char.mod(
                        "%d", col.to_numpy(np.float64).view(np.int64)
                    )
                )
            elif col.dtype == "object":
                vals = col.to_numpy()
                if len(vals) and isinstance(
                    vals[0], (list, tuple, np.ndarray, bytes)
                ):
                    return None
                if any(isinstance(v, float) for v in vals[:50]):
                    return None  # mixed/NULL-float object column
                cols.append(np.array([str(v) for v in vals]))
            else:
                cols.append(col.to_numpy().astype(str))
        # Length-prefix every field ("<len>:<value>") before joining:
        # with a bare separator, a string VALUE containing the separator
        # could make two different rows serialize identically — a false
        # PASS that would short-circuit the authoritative slow path.
        # Prefixing makes the row serialization injective regardless of
        # value content.
        def prefixed(c):
            c = np.asarray(c, dtype=str)
            return np.char.add(
                np.char.add(np.char.mod("%d", np.char.str_len(c)), ":"), c
            )

        out = prefixed(cols[0])
        for c in cols[1:]:
            out = np.char.add(out, prefixed(c))
        return np.sort(out)

    a, b = rows(s_pdf), rows(d_pdf)
    if a is None or b is None:
        return None
    return bool(np.array_equal(a, b))


def compare(spark_df, duck_df, name: str) -> list[str]:
    problems: list[str] = []
    s_pdf = spark_df if not hasattr(spark_df, "toPandas") else spark_df.toPandas()
    d_pdf = duck_df
    if len(s_pdf) != len(d_pdf):
        problems.append(f"rowcount spark={len(s_pdf)} duck={len(d_pdf)}")
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s_pdf = s_pdf[s_cols]
    d_pdf = d_pdf[s_cols]
    if len(s_pdf) == len(d_pdf):
        fast = _fast_equal(s_pdf, d_pdf)
        if fast is True:
            return problems
        # fast is False or None: fall through to the exact slow path for
        # the authoritative verdict + diagnostics
    s_rows = sorted(map(_norm_row, s_pdf.itertuples(index=False)))
    d_rows = sorted(map(_norm_row, d_pdf.itertuples(index=False)))
    n_bad = sum(1 for a, b in zip(s_rows, d_rows) if a != b)
    if n_bad:
        for a, b in zip(s_rows, d_rows):
            if a != b:
                problems.append(f"first value mismatch:\n  spark={a}\n  duck ={b}")
                break
        problems.append(f"{n_bad}/{len(s_rows)} rows differ")
    return problems


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr() is the shortest round-trip representation — EXACT double
        # comparison (two doubles differing in any bit normalize
        # differently).  Deliberately strict: the driver's value-hash may
        # be exact, so the local gate must be at least as strict.
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
        t = v.tolist()
        if isinstance(t, list):
            return tuple(_norm(x) for x in t)
        return _norm(t)
    return str(v)


def _norm_row(row):
    return tuple(_norm(v) for v in row)


def main() -> int:
    import os

    import duckdb

    # Gate mode ON by default for this tool: ML sweeps shrink (smaller
    # k-sweep, 1-point CV grid) so the FULL registry sweep fits a gate
    # budget.  Only rows-only trainers are affected — every SQL-oracled
    # comparison is identical either way.  Disable with
    # SPARK_GRAFT_GATE_MODE=0 to reproduce the driver's exact costs.
    os.environ.setdefault("SPARK_GRAFT_GATE_MODE", "1")
    gate_on = os.environ["SPARK_GRAFT_GATE_MODE"] not in ("", "0")
    if gate_on:
        print(
            "=== GATE MODE ON (SPARK_GRAFT_GATE_MODE=1): rows-only ML "
            "sweeps run shrunk (smaller k-sweep / CV grid / maxIter) — "
            "row counts and model outputs for the queries tagged "
            "[gate-mode-sensitive] below are NOT the production/driver "
            "values.  Set SPARK_GRAFT_GATE_MODE=0 to reproduce them. "
            "Every SQL-oracled comparison is identical either way. ==="
        )

    import __spark_entry__ as entrymod
    from retail_sales_project_bigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Gate sessions run tiny SFs where 32-wide shuffles are pure task-
    # scheduling overhead (measured ~1.8x on a mid-weight subset at
    # sf0.01).  Narrower shuffle width changes no values and no logical
    # plans — the plan-budget suite audits plans under the standard conf.
    spark = get_spark(
        "oracle_check",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_GATE_SHUFFLE", "8")
        ),
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    import time

    # bench.py's warmup discipline: initialize JIT/codegen/shuffle and the
    # Python worker pool BEFORE the first timed query, so the alphabetical
    # first entry doesn't absorb session startup in its number.
    from pyspark.sql import functions as F

    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.crossJoin(
        F.broadcast(warm.select(F.col("r_regionkey").alias("k")))
    ).groupBy("k").count().collect()
    spark.range(32, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    from concurrent.futures import ThreadPoolExecutor

    duck_pool = ThreadPoolExecutor(max_workers=1)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    timings: dict[str, float] = {}
    statuses: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
            # rows-only queries persist multi-consumer frames too (e.g.
            # rolling_distinct_users_hll's day-sketch frame) — release
            # them like the oracled branch does, or a full sweep
            # accumulates block-manager storage per invocation
            spark.catalog.clearCache()
            statuses[name] = {
                "status": "rows_only",
                "rows": n,
                "secs": timings[name],
            }
            tag = (
                "  [gate-mode-sensitive]"
                if gate_on and name in GATE_MODE_SENSITIVE
                else ""
            )
            print(f"{name:<28} ROWS-ONLY rows={n}  [{timings[name]}s]{tag}")
            continue
        try:
            # DuckDB runs on a worker thread WHILE Spark executes — the
            # oracle side is pure read-only SQL over the same parquet, so
            # the overlap halves the serial tail (all duck work stays on
            # ONE thread; the connection is never used concurrently).
            fut = duck_pool.submit(
                lambda sql=oracles[name]: con.execute(sql).df()
            )
            s_pdf = fn(spark, sf_dir).toPandas()
            ddf = fut.result()
            problems = compare(s_pdf, ddf, name)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()  # per-query persists are not shared across queries
        if problems:
            failed.append(name)
            statuses[name] = {
                "status": "fail",
                "problems": problems,
                "secs": timings[name],
            }
            print(f"{name:<28} FAIL  [{timings[name]}s]")
            for p in problems:
                print(f"    {p}")
        else:
            statuses[name] = {"status": "ok", "secs": timings[name]}
            print(f"{name:<28} OK  [{timings[name]}s]")
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    total = round(sum(timings.values()), 1)
    print(f"\ngate total {total}s over {len(timings)} queries; slowest:")
    for n, s in slowest:
        print(f"    {n:<36} {s}s")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    # Consolidated sweep artifact (VERDICT r5 item 8): set
    # SPARK_GRAFT_SWEEP_JSON=/path to record per-query status + timing
    # as JSON (committed per round as ORACLE_SWEEP_r{N}.json so the
    # judge can diff certification coverage without re-running).
    out_path = os.environ.get("SPARK_GRAFT_SWEEP_JSON")
    if out_path:
        import json

        with open(out_path, "w") as fh:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "gate_mode": gate_on,
                    "n_queries": len(timings),
                    "n_ok": sum(
                        1 for s in statuses.values() if s["status"] == "ok"
                    ),
                    "n_rows_only": sum(
                        1
                        for s in statuses.values()
                        if s["status"] == "rows_only"
                    ),
                    "n_fail": len(failed),
                    "total_secs": total,
                    "queries": statuses,
                },
                fh,
                indent=1,
            )
        print(f"sweep artifact written to {out_path}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
