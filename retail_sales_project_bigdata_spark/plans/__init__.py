"""Physical-plan inspection helpers (the ".explain and iterate" loop).

Used by tests and during development to assert the plans are the ones a
100 TB deployment needs: broadcast joins on dims, pushed filters, pruned
columns, no Python UDFs in relational paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def count_in_plan(df: DataFrame, needle: str) -> int:
    return physical_plan(df).count(needle)


def assert_broadcast_join(df: DataFrame, expect_at_least: int = 1) -> None:
    """The dim joins must compile to BroadcastHashJoin — a sort-merge join
    of fact × dim shuffles the fact side (terabytes at production scale)."""
    n = count_in_plan(df, "BroadcastHashJoin")
    assert n >= expect_at_least, (
        f"expected ≥{expect_at_least} BroadcastHashJoin, found {n}:\n"
        + physical_plan(df)
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, "unplanned cartesian product:\n" + plan


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """Predicate pushdown check: the parquet scan must list the filter."""
    plan = physical_plan(df)
    scans = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any(column in ln for ln in scans), (
        f"filter on {column} not pushed to scan:\n" + plan
    )


def assert_read_schema_excludes(df: DataFrame, column: str) -> None:
    """Column pruning check: the scan's ReadSchema must not fetch `column`."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema_part = line.split("ReadSchema:", 1)[-1]
            assert column not in schema_part, (
                f"column {column} not pruned from scan:\n" + line
            )


def assert_no_python_eval(df: DataFrame) -> None:
    """Relational operators must stay JVM-side (no BatchEvalPython /
    ArrowEvalPython nodes) — Python rows are the 10-100× slow path."""
    plan = physical_plan(df)
    assert "EvalPython" not in plan, "Python UDF in relational plan:\n" + plan


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans (wider is better — fewer
    breaks).  The compact plan string marks codegen'd operators ``*(n)``.
    Note: under AQE, plans containing shuffles report 0 until executed —
    plan with ``spark.sql.adaptive.enabled=false`` to inspect structure."""
    import re

    plan = physical_plan(df)
    ids = set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids) or plan.count("WholeStageCodegen")


def assert_no_unpartitioned_window(df: DataFrame) -> None:
    """Every WindowExec must carry a partitionSpec — a global window
    (``Window.orderBy`` with no partitionBy) funnels the entire frame
    through ONE task (Spark warns ``WindowExec: No Partition Defined``).
    WindowExec's simpleString is ``Window [exprs], [partitionSpec],
    [orderSpec]`` — an unpartitioned window prints only two bracket
    groups."""
    plan = physical_plan(df)
    for ln in plan.splitlines():
        stripped = ln.strip().lstrip("+-: ").lstrip("*(0123456789) ")
        if stripped.startswith("Window ["):
            assert stripped.count("], [") >= 2, (
                "unpartitioned (single-task) window:\n" + ln + "\n" + plan
            )
