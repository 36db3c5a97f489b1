"""Propose a driver-gate subset refresh.

The per-round driver gate (CORRECTNESS_r{N}.json) has checked the same
fixed ~50 queries since round 1, so everything added later is certified
only by the local full sweep (tools/oracle_check.py).  This tool emits a
suggested 50-name subset for the NEXT round, built deterministically:

1. a small STABLE CORE of flagship queries kept in every round so gate
   results stay comparable round-over-round;
2. then every query NO CORRECTNESS_r*.json has ever covered, DuckDB-
   oracled entries first (they give the strong rows+schema+hash check),
   both groups alphabetical;
3. then the remaining registry, least-recently-driver-checked first
   (ties alphabetical), as a rotation.

Adoption is the driver's call — this only prints the list (and the
coverage gap that motivates it).

Usage: python tools/gate_subset.py [size]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from _common import scan_correctness  # noqa: E402

# Flagship queries pinned into every proposed subset: the reference's own
# headline pipeline (cleaning → RFM → churn → baskets → reports) plus one
# representative per major added family (TPC-H shape, dedup, ANN, text,
# graph, dataset assembly, streaming).
STABLE_CORE = [
    "clean_lineitem",
    "rfm",
    "churn_features",
    "baskets_flat",
    "top_products",
    "pricing_summary",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ann_bruteforce_topk",
    "text_quality",
    "triangle_counts",
    "quality_funnel",
]


def proposal(size: int = 50) -> list[str]:
    import __spark_entry__ as entrymod

    qs = sorted(entrymod.queries())
    oracled = set(entrymod.oracle_sql())

    last_round_checked: dict[str, int] = {}
    for rnd, name, _row in scan_correctness():
        if name in set(qs):
            last_round_checked[name] = max(
                last_round_checked.get(name, 0), rnd
            )

    out: list[str] = [n for n in STABLE_CORE if n in set(qs)]
    never = [n for n in qs if n not in last_round_checked and n not in out]
    # oracled first: the driver's strong (rows+schema+hash) check
    for name in sorted(never, key=lambda n: (n not in oracled, n)):
        if len(out) >= size:
            break
        out.append(name)
    rest = sorted(
        (n for n in qs if n not in out and n in last_round_checked),
        key=lambda n: (last_round_checked[n], n),
    )
    for name in rest:
        if len(out) >= size:
            break
        out.append(name)
    return out[:size]


def main() -> None:
    import __spark_entry__ as entrymod

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = proposal(size)
    qs = set(entrymod.queries())
    checked = set()
    for _rnd, name, _row in scan_correctness():
        checked.add(name)
    print(
        f"# registry {len(qs)} queries; driver-checked so far "
        f"{len(checked & qs)}; never-checked {len(qs - checked)}",
        file=sys.stderr,
    )
    print(json.dumps(names, indent=1))


if __name__ == "__main__":
    main()
