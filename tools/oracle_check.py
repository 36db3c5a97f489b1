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


def compare(spark_df, duck_df, name: str) -> list[str]:
    problems: list[str] = []
    s_pdf = spark_df.toPandas()
    d_pdf = duck_df
    if len(s_pdf) != len(d_pdf):
        problems.append(f"rowcount spark={len(s_pdf)} duck={len(d_pdf)}")
    s_cols, d_cols = sorted(s_pdf.columns), sorted(d_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s_pdf = s_pdf[s_cols]
    d_pdf = d_pdf[s_cols]
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
    import duckdb

    import __spark_entry__ as entrymod
    from retail_sales_project_bigdata_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    import time

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"{name:<28} ROWS-ONLY rows={n}  [{timings[name]}s]")
            continue
        try:
            sdf = fn(spark, sf_dir)
            ddf = con.execute(oracles[name]).df()
            problems = compare(sdf, ddf, name)
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION {type(e).__name__}: {e}"]
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()  # per-query persists are not shared across queries
        if problems:
            failed.append(name)
            print(f"{name:<28} FAIL  [{timings[name]}s]")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"{name:<28} OK  [{timings[name]}s]")
    slowest = sorted(timings.items(), key=lambda kv: -kv[1])[:15]
    total = round(sum(timings.values()), 1)
    print(f"\ngate total {total}s over {len(timings)} queries; slowest:")
    for n, s in slowest:
        print(f"    {n:<36} {s}s")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
