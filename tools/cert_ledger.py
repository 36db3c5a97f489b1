"""Certification ledger: reconcile driver-side CORRECTNESS coverage.

VERDICT r7 item 4: BASELINE.md's cumulative count ("139/225") mixed two
different certification strengths.  This script makes the claim
mechanical by scanning every committed ``CORRECTNESS_r*.json`` and
classifying each registry query as:

- **driver-green (strict)**: at least one driver row with
  ``rows_match & schema_match & hash_match`` all true (the strong
  DuckDB-oracle check) AND the latest row is not red;
- **driver-executed rows-only**: driver ran it but only ever as a
  ``no_oracle`` / rows-only row (ML, seeded LSH, streaming state);
- **regressed**: strict-green in some earlier round but the LATEST row
  is red — reported separately so the headline strict count never
  includes a currently-failing query (should be empty);
- **red-latest**: latest row red, never strict (should be empty);
- **never driver-checked**: no CORRECTNESS row in any round.

The five buckets partition the registry exactly.

Usage: python tools/cert_ledger.py [--json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _common import load_entry, scan_correctness  # noqa: E402


def load_registry_names() -> set[str]:
    return set(load_entry().queries())


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
    for rnd, name, row in scan_correctness():
        if name not in names:
            continue  # renamed/removed since that round
        executed.add(name)
        if strict_green(row):
            ever_strict.add(name)
        if rnd >= latest_round.get(name, -1):
            latest_round[name] = rnd
            latest_row[name] = row

    red_now = {
        n
        for n, row in latest_row.items()
        if not strict_green(row) and not rows_only_row(row)
    }
    # A name strict in some round but red in its LATEST row is
    # "regressed", not "strict": the headline certification count must
    # never include a currently-failing query (review r8 — the earlier
    # any-round membership double-counted such names into both buckets
    # and broke the partition).
    regressed = sorted(ever_strict & red_now)
    strict = sorted(ever_strict - red_now)
    red_latest = sorted(red_now - ever_strict)
    rows_only = sorted(
        n for n in executed - ever_strict - red_now
        if rows_only_row(latest_row[n])
    )
    never = sorted(names - executed)
    leftovers = sorted(
        executed - set(strict) - set(rows_only) - red_now
    )
    assert not leftovers, (
        f"unclassifiable CORRECTNESS rows (new driver row shape?): "
        f"{leftovers}"
    )
    report = {
        "registry_total": len(names),
        "driver_green_strict": len(strict),
        "driver_executed_rows_only": len(rows_only),
        "never_driver_checked": len(never),
        "regressed": regressed,
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
    if regressed:
        print(f"REGRESSED (was strict, latest red): {regressed}")
    if red_latest:
        print(f"RED in latest row:           {red_latest}")
    print(f"rows-only names: {rows_only}")


if __name__ == "__main__":
    main()
