"""Shared helpers for the round-protocol tools (cert_ledger,
gate_subset, driver_gate_sim): ONE definition of how the entry module
is loaded and how the CORRECTNESS_r*.json history is scanned, so the
rotation proposal and the certification ledger can never silently
disagree about artifact naming or row schema."""

from __future__ import annotations

import glob
import importlib.util
import json
import re

ENTRY_PATH = "/root/repo/__spark_entry__.py"


def load_entry(path: str = ENTRY_PATH):
    """Load ``__spark_entry__`` BY FILE PATH — the round driver's own
    loading mode (the module self-bootstraps sys.path; that bootstrap
    is part of the contract under test for the gate sim)."""
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def scan_correctness(pattern: str = "/root/repo/CORRECTNESS_r*.json"):
    """Yield ``(round_number, name, row)`` for every row of every
    committed driver CORRECTNESS artifact, in round order."""
    for path in sorted(glob.glob(pattern)):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        for name, row in json.load(open(path)).items():
            yield rnd, name, row
