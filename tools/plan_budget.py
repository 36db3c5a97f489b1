"""Generate tests/plan_budgets.json — the checked-in per-query plan
budgets that tests/test_plan_budgets.py enforces.

Each headline query gets a budget of scale-relevant plan facts
(shuffle exchange count, python-eval node count, cartesian products).
The test rebuilds every plan (analysis only — nothing executes) and
fails if any count EXCEEDS its budget, so a rewrite that silently adds
a shuffle or drops work into row-at-a-time Python breaks the suite
instead of the 100 TB run.  Re-run this script only when a plan change
is intentional; the diff of the JSON is then the review artifact.

Usage: python tools/plan_budget.py [sf_dir]   (writes the JSON)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from plan_audit import HEADLINE, summarize  # noqa: E402

BUDGET_PATH = "/root/repo/tests/plan_budgets.json"

# The facts a budget locks down. broadcast/sort-merge join MIXES are
# audited in PLANS.md instead: AQE may legitimately flip SMJ→broadcast
# at runtime, but it never *adds* a shuffle exchange to a logical plan
# or introduces a Python eval node — those only regress via code.
# ``python_eval`` counts Batch/ArrowEvalPython (scalar row/batch UDFs —
# banned in relational paths, budget 0 everywhere) and deliberately NOT
# the sanctioned Arrow group-map nodes (FlatMapGroupsInPandas /
# MapInPandas), which are the designed escape hatch for ML rerank and
# media decode.
BUDGET_KEYS = ("shuffle_exchanges", "python_eval", "cartesian")


def budgeted_names(queries: dict) -> list[str]:
    """Every registered query EXCEPT the streaming set: a streaming
    query's builder runs a memory-sink stream to completion and returns
    the result table, so its "plan" is a memory scan — the real
    micro-batch plans are compiled per-trigger at runtime.  Those are
    held to the same python_eval/cartesian facts by
    tests/test_streaming_plans.py, which asserts on the LAST EXECUTED
    micro-batch plan captured in streaming.LAST_MICROBATCH_PLANS."""
    return sorted(n for n in queries if not n.startswith("streaming_"))


def current_counts(sf_dir: str) -> dict[str, dict[str, int]]:
    import __spark_entry__ as entrymod
    from retail_sales_project_bigdata_spark.session import get_spark

    spark = get_spark("plan_budget")
    # same posture as plan_audit: count on the pre-AQE plan so budgets
    # are deterministic (AQE placeholders hide/rename exchanges).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    queries = entrymod.queries()
    out: dict[str, dict[str, int]] = {}
    for name in budgeted_names(queries):
        # per-query cache hygiene: a query that persists at build time
        # (e.g. the skyline's bucket summaries) would otherwise plan as
        # InMemoryTableScan inside LATER queries' plans, shifting their
        # exchange counts by compile order.
        spark.catalog.clearCache()
        plan = queries[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        s = summarize(plan)
        out[name] = {k: int(s[k]) for k in BUDGET_KEYS}
    spark.catalog.clearCache()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    budgets = current_counts(sf_dir)
    with open(BUDGET_PATH, "w") as f:
        json.dump(budgets, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {BUDGET_PATH} ({len(budgets)} queries)")


if __name__ == "__main__":
    main()
