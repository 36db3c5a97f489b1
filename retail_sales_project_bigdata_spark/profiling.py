"""Query profiling: run a registered query and report where the time and
tasks went — the ``.explain and iterate`` loop's runtime half.

``profile_query`` executes the plan under a dedicated job group, then
reads the driver's status tracker for the jobs/stages/tasks that group
launched, and pairs that with facts read from the *finalized* physical
plan (exchanges, joins, python-eval nodes, whole-stage-codegen spans).
Execution goes through the DataFrame's own ``queryExecution`` (via
``toRdd().count()``, a distributed count — nothing is collected to the
driver), because a ``df.write`` action compiles a *separate* query
execution and AQE only stamps codegen/final-plan facts on the one that
ran.  Everything comes from public PySpark APIs
(``SparkContext.statusTracker``, ``QueryExecution.executedPlan``) — no
UI, no event-log parsing — so it works in headless/local mode and on a
cluster alike.

CLI: ``python -m retail_sales_project_bigdata_spark profile <name>``.
"""

from __future__ import annotations

import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def profile_df(df: DataFrame, label: str = "profile") -> dict[str, object]:
    """Materialize ``df`` (distributed count over its own query execution
    — full execution, no rows to the driver) inside a fresh job group and
    return the runtime + finalized-plan profile."""
    spark = df.sparkSession
    sc = spark.sparkContext
    group = f"{label}-{uuid.uuid4().hex[:8]}"
    tracker = sc.statusTracker()
    sc.setJobGroup(group, label, interruptOnCancel=False)
    try:
        t0 = time.perf_counter()
        df._jdf.queryExecution().toRdd().count()
        wall = time.perf_counter() - t0
    finally:
        sc.setJobGroup(None, None)

    job_ids = sorted(tracker.getJobIdsForGroup(group))
    n_stages = 0
    n_tasks = 0
    n_failed = 0
    for jid in job_ids:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            st = tracker.getStageInfo(sid)
            if st is None:
                continue
            n_stages += 1
            n_tasks += st.numTasks
            n_failed += st.numFailedTasks

    # The finalized (post-AQE) plan of the execution that actually ran —
    # codegen span ids (`*(N)` markers) only exist on this one.
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "label": label,
        "wall_sec": round(wall, 3),
        "jobs": len(job_ids),
        "stages": n_stages,
        "tasks": n_tasks,
        "failed_tasks": n_failed,
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffledhash_joins": plan.count("ShuffledHashJoin"),
        "python_eval_nodes": sum(
            plan.count(n)
            for n in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
        ),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def profile_query(
    spark: SparkSession, name: str, sf_dir: str
) -> dict[str, object]:
    """Profile a registered query by name (see ``registry.queries``)."""
    from retail_sales_project_bigdata_spark.registry import queries

    qs = queries()
    if name not in qs:
        raise KeyError(
            f"unknown query {name!r}; see `python -m "
            "retail_sales_project_bigdata_spark list`"
        )
    return profile_df(qs[name](spark, sf_dir), label=name)
