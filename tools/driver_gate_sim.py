"""Foreign-cwd replica of the driver's CORRECTNESS gate.

Loads ``__spark_entry__.py`` by file path (run this from OUTSIDE the
repo, e.g. ``cd /tmp && python /root/repo/tools/driver_gate_sim.py`` —
that is how the round driver loads it, and it catches worker-import and
sys.path bugs the in-repo tests cannot), runs queries at sf0.01 next to
their DuckDB oracles, and canonicalizes BOTH sides with a plain pandas
``sort_values`` over every column — the exact driver step that red-rowed
``embedding_quantize_int8`` in round 6 (list cells) and that
``frame_sample``/``media_stats_by_modality`` would have failed in round
7 (worker ModuleNotFoundError from a foreign cwd) before
``session.ensure_package_on_workers``.

The tool mutates NOTHING driver-side: ``__spark_entry__`` self-inserts
the repo dir into ``sys.path`` when loaded by path (that IS the driver
contract), so ``get_spark``/``GATE_ORDER`` import cleanly afterwards —
importing them here exercises the same path the driver does, rather
than papering over it with an extra insert (ADVICE r7).

Usage::

    python tools/driver_gate_sim.py                 # the 50 GATE_ORDER names
    python tools/driver_gate_sim.py --all           # FULL registry (oracled →
                                                    # strong check; rest →
                                                    # rows-only, like the driver)
    python tools/driver_gate_sim.py q1 q2 ...       # just these queries
    python tools/driver_gate_sim.py --sf DIR --out FILE ...

Exit status 1 on any failure.  ``--out`` writes a per-query JSON
artifact (CORRECTNESS-shaped) for the round record.
"""

import argparse
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import load_entry  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def canon(df: "pd.DataFrame") -> "pd.DataFrame":
    """The driver's canonicalization: columns sorted by name, rows sorted
    by ALL columns via plain pandas sort_values."""
    cols = sorted(df.columns)
    return df[cols].sort_values(by=cols).reset_index(drop=True)


def compare_column(a: "np.ndarray", b: "np.ndarray") -> bool:
    """EXACT value compare like the driver's value hash — the engine's
    rounding discipline (pround/stable_sum) exists precisely so float
    outputs match bit-for-bit.  The numeric branch requires BOTH sides
    to be a true numeric dtype (float/int/uint — NOT object): an object
    column (e.g. floats with None mixed in after toPandas) goes to the
    string compare instead, where None and NaN stringify DIFFERENTLY —
    ``pd.to_numeric`` would silently coerce None to NaN and mask a real
    NULL-vs-NaN engine divergence as a match (review r8), and a
    too-strict FAIL that gets investigated beats a false green from the
    tool whose whole job is predicting the driver's exact check.  But a
    float64-vs-int64 pair (DuckDB BIGINT vs Spark DOUBLE for a
    value-equal column) has no None masking risk — neither dtype can
    hold None — and the driver itself compares those numerically, so
    sending it to the string path ('5' vs '5.0') would be a sim
    false-FAIL that does NOT predict the driver verdict (ADVICE r8)."""
    if a.dtype.kind in "fiu" and b.dtype.kind in "fiu":
        return bool(
            np.allclose(
                a.astype(float), b.astype(float),
                rtol=0, atol=0, equal_nan=True,
            )
        )
    sa = pd.Series(a).astype(str)
    sb = pd.Series(b).astype(str)
    return bool((sa == sb).all())


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("queries", nargs="*", help="query names (default: GATE_ORDER)")
    ap.add_argument("--all", action="store_true", help="run the FULL registry")
    ap.add_argument("--sf", default="/root/testdata/sf0.01", help="parquet dir")
    ap.add_argument("--out", default=None, help="write per-query JSON artifact")
    ap.add_argument("--entry", default="/root/repo/__spark_entry__.py")
    args = ap.parse_args()

    # Load by file path — the driver's loading mode.  The entry module's
    # own sys.path bootstrap is part of the contract under test.
    mod = load_entry(args.entry)
    from retail_sales_project_bigdata_spark.registry import GATE_ORDER
    from retail_sales_project_bigdata_spark.session import get_spark

    qs = mod.queries()
    ors = mod.oracle_sql()
    if args.queries:
        unknown = [n for n in args.queries if n not in qs]
        if unknown:
            print(f"unknown queries: {unknown}", file=sys.stderr)
            return 2
        names = list(args.queries)
    elif args.all:
        names = list(qs)
    else:
        names = list(GATE_ORDER)

    spark = get_spark("gatesim", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    results: dict[str, dict] = {}
    fails = []
    for name in names:
        row = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            s = canon(qs[name](spark, args.sf).toPandas())
            row["spark_rows"] = len(s)
            if name not in ors:
                # rows-only entries (ML/seeded/streaming): emit the
                # DRIVER'S rows-only row shape (err="no_oracle", null
                # match flags, spark_rows recorded — see
                # CORRECTNESS_r01 fpgrowth_itemsets) so a sim artifact
                # entering the round record can never be classified as
                # a strict oracle pass by tools/cert_ledger.py
                # (review r8: the earlier all-True shape was exactly
                # the strength conflation the ledger exists to avoid).
                row.update(
                    rows_match=None, schema_match=None, hash_match=None,
                    oracle_rows=None, err="no_oracle",
                )
                print(f"{name:<40} OK rows-only ({len(s)} rows)")
            else:
                o = canon(con.execute(ors[name]).fetchdf())
                row["oracle_rows"] = len(o)
                assert list(s.columns) == list(o.columns), (
                    f"schema {list(s.columns)} vs {list(o.columns)}"
                )
                row["schema_match"] = True
                assert len(s) == len(o), f"rows {len(s)} vs {len(o)}"
                row["rows_match"] = True
                for c in s.columns:
                    assert compare_column(
                        s[c].to_numpy(), o[c].to_numpy()
                    ), f"values differ in {c}"
                row["hash_match"] = True
                print(f"{name:<40} OK ({len(s)} rows)")
        except Exception as ex:
            row["err"] = repr(ex)[:300]
            fails.append((name, row["err"]))
            print(f"{name:<40} FAIL {ex!r}"[:160])
        finally:
            # release per-query persists even on failure — accumulated
            # caches otherwise pressure every later query in the sweep
            spark.catalog.clearCache()
        results[name] = row

    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)
        print(f"wrote {args.out}")
    print(f"\n{len(fails)} failures of {len(names)}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
