"""Foreign-cwd replica of the driver's CORRECTNESS gate.

Loads ``__spark_entry__.py`` by file path (run this from OUTSIDE the
repo, e.g. ``cd /tmp && python /root/repo/tools/driver_gate_sim.py`` —
that is how the round driver loads it, and it catches worker-import and
sys.path bugs the in-repo tests cannot), runs every GATE_ORDER query at
sf0.01 next to its DuckDB oracle, and canonicalizes BOTH with a plain
pandas ``sort_values`` over every column — the exact driver step that
red-rowed ``embedding_quantize_int8`` in round 6 (list cells) and that
``frame_sample``/``media_stats_by_modality`` would have failed in round
7 (worker ModuleNotFoundError from a foreign cwd) before
``session.ensure_package_on_workers``.
"""
import sys, importlib.util
import pandas as pd
import numpy as np
import duckdb

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
sys.path.insert(0, "/root/repo")
from retail_sales_project_bigdata_spark.session import get_spark
from retail_sales_project_bigdata_spark.registry import GATE_ORDER

SF = "/root/testdata/sf0.01"
spark = get_spark("gatesim", shuffle_partitions=8)
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings".split()):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = mod.queries(); ors = mod.oracle_sql()
fails = []
for name in GATE_ORDER:
    try:
        sdf = qs[name](spark, SF).toPandas()
        odf = con.execute(ors[name]).fetchdf()
        # driver-style canonicalization: columns sorted by name, rows
        # sorted by ALL columns via plain pandas sort_values
        s = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
        o = odf[sorted(odf.columns)].sort_values(by=sorted(odf.columns)).reset_index(drop=True)
        assert list(s.columns) == list(o.columns), f"schema {list(s.columns)} vs {list(o.columns)}"
        assert len(s) == len(o), f"rows {len(s)} vs {len(o)}"
        for c in s.columns:
            a, b = s[c].to_numpy(), o[c].to_numpy()
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                # EXACT like the driver's value hash — the engine's
                # rounding discipline (pround/stable_sum) exists
                # precisely so float outputs match bit-for-bit
                ok = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
            else:
                ok = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
            assert ok, f"values differ in {c}"
        print(f"{name:<36} OK ({len(s)} rows)")
    except Exception as ex:
        fails.append((name, repr(ex)[:200]))
        print(f"{name:<36} FAIL {ex!r}"[:160])
    finally:
        # release per-query persists even on failure — accumulated
        # caches otherwise pressure every later query in the sweep
        spark.catalog.clearCache()
print(f"\n{len(fails)} failures of {len(GATE_ORDER)}")
sys.exit(1 if fails else 0)
