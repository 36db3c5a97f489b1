"""Synthesize the NEXT 10x decade from an existing dataset directory
(e.g. .scale/sf1 -> .scale/sf10) for the scaling probe's extra step.

Same join-consistent key-offset scheme as tools/gen_sf1.py (each copy i
offsets every key column by i * OFF; shared dims region/nation are not
copied), with two differences that make it safe to stack on an ALREADY
DERIVED source:

- ``documents``: gen_sf1's caesar shift has only 26 distinct values, so
  composing it across two decades would collide token spaces between
  copies (shift i then j == shift i+j mod 26) and re-create cross-copy
  near-dup structure the derivation must avoid.  Here EVERY copy i —
  including copy 0 (ADVICE r7: an untagged copy 0 lets a source token
  that literally ends in a tag, e.g. 'fooq1', collide with copy 1's
  'foo' -> 'fooq1') — appends a copy tag to every token (regexp:
  ``\\w+`` -> ``\\0q{i}``): within-copy shingle/duplicate structure is
  preserved exactly, every token carries exactly one per-decade tag
  whose suffix uniquely identifies the copy, so tokens are disjoint
  across copies at ANY copy count, and the transform composes with
  itself (tags concatenate, rightmost = outermost decade).
- ``embeddings``: per-(copy, dim) LCG sign-flips like gen_sf1, but with
  a SEED argument mixed into the LCG so stacked decades use independent
  flip patterns — if a second-decade pattern equaled a first-decade one,
  the composed corpus would contain exact cosine-1 twins across copies.

OFF is derived from the source's max key (next power of 10 above it), so
stacking decades cannot collide ids.

Usage: python tools/gen_scale.py [src_dir] [out_dir] [copies] [seed] [tables]
Defaults: .scale/sf1 .scale/sf10 10 1 <all>
``tables`` (comma list, e.g. ``documents,embeddings``) restricts output
to the named tables for TARGETED decade probes — a full sf100 is ~24 GB
of mostly-lineitem nobody reads, while the round-9 dedup_groups /
semantic_dedup probes only scan documents + embeddings (~1 GB).
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, ".scale", "sf1")
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, ".scale", "sf10")
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
SEED = int(sys.argv[4]) if len(sys.argv) > 4 else 1
TABLES = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    # OFF: next power of 10 strictly above every key in the source, so
    # copy ids never collide however many decades are stacked.
    # embeddings.vec_id is offset in the numpy block below, not via
    # KEYED — include it in the max scan or a vec_id range larger than
    # every KEYED key would silently collide across copies.
    max_key = 0
    for t, keys in list(KEYED.items()) + [("embeddings", ["vec_id"])]:
        for k in keys:
            v = con.sql(
                f"SELECT max({k}) FROM '{SRC}/{t}.parquet'"
            ).fetchone()[0]
            max_key = max(max_key, int(v or 0))
    off = 10
    while off <= max_key:
        off *= 10
    print(f"max source key {max_key} -> OFF {off}")

    for t in ("region", "nation"):
        if TABLES is not None and t not in TABLES:
            continue
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet')"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied (shared dim)")

    for t, keys in KEYED.items():
        if TABLES is not None and t not in TABLES:
            continue
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            # tagged text lengthens every token, so the stored n_chars
            # metadata must be recomputed for tagged copies — the
            # n_chars-consuming queries (quality gates, length-weighted
            # sampling, dataset cards) otherwise compute on stale
            # lengths at the derived scale.
            # copy 0 is tagged too (q0): see the module docstring —
            # an untagged copy 0 re-admits cross-copy token collisions
            # when a source token happens to end in another copy's tag.
            text_expr = f"regexp_replace(text, '(\\w+)', '\\0q{i}', 'g')"
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i * off} AS {c}")
                elif t == "documents" and c == "text":
                    exprs.append(f"{text_expr} AS text")
                elif t == "documents" and c == "n_chars":
                    exprs.append(f"length({text_expr}) AS n_chars")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)})"
            f" TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(
            f"SELECT count(*) FROM '{OUT}/{t}.parquet'"
        ).fetchone()[0]
        print(t, n, "rows")

    if TABLES is not None and "embeddings" not in TABLES:
        print("wrote", OUT)
        return
    rows = con.sql(
        f"SELECT vec_id, embedding, label FROM '{SRC}/embeddings.parquet'"
        " ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float32)
    labels = np.array([r[2] for r in rows], dtype=np.int32)
    dim = mat.shape[1]
    out_ids, out_vecs, out_labels = [], [], []
    for i in range(COPIES):
        if i == 0:
            signs = np.ones(dim, dtype=np.float32)
        else:
            # LCG over (copy, dim) with SEED mixed in: independent from
            # gen_sf1's patterns (seed 0 there), so stacked decades never
            # reproduce a first-decade flip pattern (which would create
            # exact cosine-1 twins across copies).
            x = (
                np.arange(dim, dtype=np.int64) * 1103515245
                + (i + SEED * 65537) * 2654435761
            ) % (1 << 31)
            signs = np.where((x >> 7) & 1 == 0, 1.0, -1.0).astype(
                np.float32
            )
        out_ids.append(ids + i * off)
        out_vecs.append(mat * signs[None, :])
        out_labels.append(labels)
    table = pa.table(
        {
            "vec_id": np.concatenate(out_ids),
            "embedding": pa.array(
                [v for block in out_vecs for v in block.tolist()],
                type=pa.list_(pa.float32()),
            ),
            "label": np.concatenate(out_labels),
        }
    )
    pq.write_table(table, f"{OUT}/embeddings.parquet")
    print("embeddings", table.num_rows, "rows")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
