"""Per-microbatch plan gate for the streaming queries — the one budget
gap the batch plan suite can't cover (tools/plan_budget.py excludes
``streaming_*``: a finished streaming query returns a memory-sink scan;
the real plans are compiled per trigger).

Each streaming query is driven to completion and the LAST EXECUTED
micro-batch plan (captured by ``_run_to_memory`` just before the stream
stops) is held to the same scale facts the batch budgets pin: no
row-at-a-time / Arrow scalar Python eval (``*EvalPython``) and no
cartesian product.  ``applyInPandasWithState`` plans as
``FlatMapGroupsInPandasWithState`` — the sanctioned stateful escape
hatch — and deliberately does NOT trip the EvalPython counter, same as
the batch suite's treatment of group-map Arrow nodes.
"""

from __future__ import annotations

import sys

import pytest

from tests.conftest import SF_SMALL

sys.path.insert(0, "/root/repo/tools")


def _streaming_queries():
    from retail_sales_project_bigdata_spark import streaming

    return sorted(streaming.QUERIES)


@pytest.mark.parametrize("name", _streaming_queries())
def test_microbatch_plan_within_budget(spark, name):
    from plan_audit import summarize

    from retail_sales_project_bigdata_spark import streaming

    before = set(streaming.LAST_MICROBATCH_PLANS)
    streaming.QUERIES[name](spark, SF_SMALL)
    new = {
        k: v
        for k, v in streaming.LAST_MICROBATCH_PLANS.items()
        if k not in before
    }
    assert new, f"{name} started no captured stream"
    for sink, plan in new.items():
        assert plan, f"{name}/{sink}: micro-batch plan capture failed"
        # a stream that executed ZERO micro-batches explains as a
        # "No physical plan" placeholder — that would pass the budget
        # checks vacuously, so require an actually-executed plan
        assert "== Physical Plan ==" in plan and "No physical plan" not in plan, (
            f"{name}/{sink}: no micro-batch ever executed; capture is "
            "not load-bearing:\n" + plan[:500]
        )
        s = summarize(plan)
        assert s["python_eval"] == 0, (
            f"{name}/{sink}: Python eval node in a micro-batch plan:\n"
            + plan[:2000]
        )
        assert s["cartesian"] == 0, (
            f"{name}/{sink}: cartesian product in a micro-batch plan:\n"
            + plan[:2000]
        )
        # stateful ops must actually be the sanctioned node when present
        if "InPandasWithState" in plan:
            assert "FlatMapGroupsInPandasWithState" in plan
