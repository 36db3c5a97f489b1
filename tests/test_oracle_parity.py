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
    for entries without an oracle) + the gate-output convention: every
    registry entry is a gate-rotation candidate, and the driver's
    correctness gate canonicalizes results with a pandas sort that dies
    on list cells (round-6 ``embedding_quantize_int8`` red row:
    ``TypeError: unhashable type: 'list'``).  So gate-facing outputs
    carry SCALAR top-level columns only — serialize arrays with
    ``array_join`` (DuckDB mirror ``array_to_string``) or explode;
    keep typed-array forms as non-registered library functions (e.g.
    ``embedding_quantize_int8_vectors``)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    df = _QUERIES[name](spark, SF_SMALL)
    assert df.columns
    complex_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{name} returns complex-typed top-level column(s) {complex_cols}:"
        " the driver gate cannot canonicalize list/struct cells —"
        " serialize them (array_join / to_json) in the registered query"
        " and keep the typed form as a library function"
    )
    df.limit(5).collect()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_gate_order_matches_committed_artifact():
    """The driver certifies the FIRST 50 registry entries; the committed
    GATE_SUBSET_r09.json is the judge-auditable record of that subset.
    They must never drift apart: same 50 names, same order, all present
    in the registry.  Round 9 is the certification finisher (VERDICT r8
    item 1): the 12-name stable core returns plus every never-certified
    name — 16 DuckDB-oracled (strong rows+schema+hash check) + 22
    rows-only entries the oracle cannot express (the driver records
    those as executed ``no_oracle`` rows)."""
    import json

    from retail_sales_project_bigdata_spark.registry import GATE_ORDER

    artifact = json.load(open("/root/repo/GATE_SUBSET_r09.json"))
    assert artifact["names"] == GATE_ORDER
    assert len(GATE_ORDER) == 50
    qs = entrymod.queries()
    assert list(qs)[:50] == GATE_ORDER
    oracles = entrymod.oracle_sql()
    # The artifact's oracled/rows-only split must reflect reality.
    assert artifact["first_time_oracled"] == [
        n
        for n in GATE_ORDER
        if n in oracles and n not in artifact["stable_core"]
    ]
    assert artifact["first_time_rows_only"] == [
        n for n in GATE_ORDER if n not in oracles
    ]
    assert len(artifact["stable_core"]) == 12
    assert len(artifact["first_time_oracled"]) == 16
    assert len(artifact["first_time_rows_only"]) == 22


def test_package_shipped_to_python_workers(spark):
    """Module-level functions inside mapInPandas/applyInPandas are
    pickled by reference, so Python workers must be able to import this
    package.  In local mode that silently works only while the driver's
    cwd is the repo root (``python -m pyspark.daemon`` prepends the
    daemon's cwd); the round driver loads ``__spark_entry__.py`` by path
    from a foreign cwd, where round-7's gate queries ``frame_sample`` /
    ``media_stats_by_modality`` raised ModuleNotFoundError in the worker
    until ``session.ensure_package_on_workers`` shipped a package zip
    through addPyFile.  Assert the ship actually happens on the shared
    read path (tools/driver_gate_sim.py is the foreign-cwd e2e proof)."""
    from retail_sales_project_bigdata_spark.sources import read_table

    read_table(spark, SF_SMALL, "region")
    assert any(
        "retail_sales_project_bigdata_spark_pkg" in f
        for f in spark.sparkContext.listFiles
    )
