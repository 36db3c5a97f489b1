"""Certification ledger: reconcile driver-side CORRECTNESS coverage.

VERDICT r7 item 4: BASELINE.md's cumulative count ("139/225") mixed two
different certification strengths.  This script makes the claim
mechanical by scanning every committed ``CORRECTNESS_r*.json`` and
classifying each registry query as:

- **driver-green (strict)**: at least one driver row with
  ``rows_match & schema_match & hash_match`` all true (the strong
  DuckDB-oracle check);
- **driver-executed rows-only**: driver ran it but only ever as a
  ``no_oracle`` / rows-only row (ML, seeded LSH, streaming state);
- **red-latest**: the most recent driver row failed (should be empty);
- **never driver-checked**: no CORRECTNESS row in any round.

Usage: python tools/cert_ledger.py [--json]
"""

from __future__ import annotations

import glob
import importlib.util
import json
import re
import sys


def load_registry_names() -> set[str]:
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.queries())


def strict_green(row: dict) -> bool:
    """All three match flags true with no error — the strong check."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
        and not row.get("err")
    )


def rows_only_row(row: dict) -> bool:
    """The driver's rows-only execution format: ``err: "no_oracle"``
    with null match flags but a recorded spark_rows."""
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


def main() -> None:
    names = load_registry_names()
    latest_round: dict[str, int] = {}
    latest_row: dict[str, dict] = {}
    ever_strict: set[str] = set()
    executed: set[str] = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        for name, row in json.load(open(path)).items():
            if name not in names:
                continue  # renamed/removed since that round
            executed.add(name)
            if strict_green(row):
                ever_strict.add(name)
            if rnd >= latest_round.get(name, -1):
                latest_round[name] = rnd
                latest_row[name] = row

    rows_only = sorted(
        n for n in executed - ever_strict if rows_only_row(latest_row[n])
    )
    red_latest = sorted(
        n
        for n, row in latest_row.items()
        if not strict_green(row) and not rows_only_row(row)
    )
    never = sorted(names - executed)
    report = {
        "registry_total": len(names),
        "driver_green_strict": len(ever_strict),
        "driver_executed_rows_only": len(rows_only),
        "never_driver_checked": len(never),
        "red_latest": red_latest,
        "rows_only_names": rows_only,
        "never_names": never,
    }
    if "--json" in sys.argv:
        print(json.dumps(report, indent=1))
        return
    print(f"registry queries:            {report['registry_total']}")
    print(f"driver-green (strict):       {report['driver_green_strict']}")
    print(f"driver-executed rows-only:   {report['driver_executed_rows_only']}")
    print(f"never driver-checked:        {report['never_driver_checked']}")
    if red_latest:
        print(f"RED in latest row:           {red_latest}")
    print(f"rows-only names: {rows_only}")


if __name__ == "__main__":
    main()
