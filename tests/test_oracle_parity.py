"""Every queries() entry with an oracle must match DuckDB at sf0.001.

This is a faster local version of the driver's CORRECTNESS gate (which runs
at sf0.01 — tools/oracle_check.py covers that interactively).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMALL, assert_oracle_match

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, duck, name):
    assert name in _QUERIES, f"oracle_sql has {name} but queries() doesn't"
    sdf = _QUERIES[name](spark, SF_SMALL)
    assert_oracle_match(sdf, duck, _ORACLES[name])


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs(spark, name):
    """Rows-only smoke for every query (driver runs the same weaker check
    for entries without an oracle)."""
    df = _QUERIES[name](spark, SF_SMALL)
    assert df.columns
    df.limit(5).collect()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_gate_order_matches_committed_artifact():
    """The driver certifies the FIRST 50 registry entries; the committed
    GATE_SUBSET_r06.json is the judge-auditable record of that subset.
    They must never drift apart: same 50 names, same order, all present
    in the registry with a DuckDB oracle (the strong gate check)."""
    import json

    from retail_sales_project_bigdata_spark.registry import GATE_ORDER

    artifact = json.load(open("/root/repo/GATE_SUBSET_r06.json"))
    assert artifact["names"] == GATE_ORDER
    assert len(GATE_ORDER) == 50
    qs = entrymod.queries()
    assert list(qs)[:50] == GATE_ORDER
    oracles = entrymod.oracle_sql()
    assert all(n in oracles for n in GATE_ORDER)
