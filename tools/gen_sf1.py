"""Synthesize a local sf1 dataset (10x sf0.1) for the scaling probe.

/root/testdata is read-only and tops out at sf0.1, so the 4th scaling
step is DERIVED: each table becomes 10 key-offset copies of its sf0.1
self, written to .scale/sf1/ (gitignored).  Copies are made join-
consistent by offsetting every key column of copy ``i`` by ``i * OFF``
(orders keep their lineitems, customers their orders); the shared dims
(region, nation) are NOT copied, so nationkey references stay valid.

Two tables need more than offsets to keep 10x honest:

- ``documents``: verbatim copies would hand the dedup/minhash shapes a
  corpus where EVERY doc has 9 exact twins — near-dup structure would
  grow 100x, not 10x.  Each copy caesar-shifts its letters (shift = i),
  so tokens are disjoint ACROSS copies while the within-copy
  shingle/duplicate structure is preserved exactly.  Copy 0 is identity.
- ``embeddings``: verbatim copies put 9 cosine-1.0 twins next to every
  vector (quadratic near-dup output).  Each copy applies a deterministic
  per-(copy, dim) sign-flip pattern, which decorrelates copies
  (E[cosine] ~ N(0, 1/64)) while preserving norms and within-copy
  geometry.  Copy 0 is identity, so the vec_id < 10 query set is intact.

Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1")
)
COPIES = 10
OFF = 10_000_000  # exceeds every key's max at sf0.1 by >10x

ALPHA = "abcdefghijklmnopqrstuvwxyz"

# key columns to offset, per table (copy i adds i*OFF to each)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
}


def caesar(shift: int) -> tuple[str, str]:
    src = ALPHA + ALPHA.upper()
    dst = (
        ALPHA[shift:] + ALPHA[:shift]
        + (ALPHA[shift:] + ALPHA[:shift]).upper()
    )
    return src, dst


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied (shared dim)")

    for t, keys in KEYED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(COPIES):
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"{c} + {i * OFF} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    s, d = caesar(i)
                    exprs.append(f"translate(text, '{s}', '{d}') AS text")
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{SRC}/{t}.parquet'"
            )
        con.sql(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")

    # embeddings: numpy sign-flip per copy (deterministic, norm-preserving)
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
            # fixed LCG over (copy, dim) — reproducible, no RNG state
            x = (np.arange(dim, dtype=np.int64) * 1103515245 + i * 2654435761) % (1 << 31)
            signs = np.where((x >> 7) & 1 == 0, 1.0, -1.0).astype(np.float32)
        out_ids.append(ids + i * OFF)
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
