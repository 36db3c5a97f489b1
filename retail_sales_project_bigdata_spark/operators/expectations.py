"""Declarative data-quality expectations: rule lists validated in ONE
pass, with a violation report and a good/quarantine split — the
ingest-gate pattern (Delta Live Tables expectations / Great Expectations
checkpoints) expressed as plain DataFrame operators.

Complements ``olap.dq_referential_audit`` (cross-table FK orphans): these
are ROW-LEVEL constraints — range checks, domain membership, internal
consistency — the kind every 100 TB ingest runs before publishing a
partition.

Semantics: a rule is ``(name, condition)`` where GOOD rows satisfy the
condition; a row violates the rule when the condition is **not TRUE**
(so a NULL comparison counts as a violation, matching SQL constraint
semantics and DLT's ``expect``).

Scale design:

- ``apply_expectations`` annotates each row with its violated-rule list
  as one projection — N rules compile into ONE whole-stage-codegen'd
  array expression, no per-rule pass, no shuffle.
- ``expectations_report`` is ONE aggregate over the annotated frame
  (count + N conditional sums) melted via ``stack`` — a single
  partial+final hash agg regardless of rule count.
- ``split_quarantine`` filters the same annotated frame twice; at scale
  you write both sinks from one pass (``observed_write`` carries the
  counts on the write job itself).

Reference spec: the reference validates implicitly (drop non-positive
quantities, ``FullPreprocessingPipeline.java:73-74``; null-fill,
``:103-113``) — this generalizes that into the declarative form those
hard-coded checks are instances of.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.sources import read_table

Rule = tuple[str, Column]


def apply_expectations(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Annotate each row with ``violations``: the comma-joined names of
    every rule whose condition is not TRUE for the row, in rule-list
    order (deterministic), empty string for clean rows.  One projection;
    all JVM-side."""
    tags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in rules
    ]
    return df.withColumn(
        "violations",
        F.array_join(
            F.filter(F.array(*tags), lambda x: x.isNotNull()), ","
        ),
    )


def expectations_report(
    df: DataFrame, rules: list[Rule], dataset: str
) -> DataFrame:
    """Per-rule violation report: (dataset, rule, n_rows, n_violations,
    violation_rate).  ONE aggregate pass for all rules."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, (_, cond) in enumerate(rules):
        aggs.append(
            F.sum(
                F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
            ).alias(f"_v{i}")
        )
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', _v{i}" for i, (name, _) in enumerate(rules)
    )
    melted = one.select(
        F.col("_n"),
        F.expr(
            f"stack({len(rules)}, {stack_args}) AS (rule, n_violations)"
        ),
    )
    return melted.select(
        F.lit(dataset).alias("dataset"),
        "rule",
        F.col("_n").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations").cast("double") / F.col("_n")).alias(
            "violation_rate"
        ),
    )


def split_quarantine(annotated: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) from an ``apply_expectations`` frame."""
    clean = F.col("violations") == ""
    return annotated.filter(clean), annotated.filter(~clean)


# ---------------------------------------------------------------------------
# Gate queries: business-rule suites with REAL violation mass (the
# testdata is referentially clean, so domain thresholds — not tautologies
# — are what give the oracle a non-trivial distribution to hash).

def _lineitem_rules() -> list[Rule]:
    return [
        ("quantity_positive", F.col("l_quantity") > 0),
        ("quantity_le_40", F.col("l_quantity") <= 40),
        ("discount_policy_5pct", F.col("l_discount") <= 0.05),
        ("tax_le_6pct", F.col("l_tax") <= 0.06),
        ("price_positive", F.col("l_extendedprice") > 0),
        ("returnflag_domain", F.col("l_returnflag").isin("A", "N", "R")),
    ]


def _documents_rules() -> list[Rule]:
    return [
        ("min_200_chars", F.col("n_chars") >= 200),
        ("nchars_consistent", F.col("n_chars") == F.length("text")),
        ("lang_known", F.col("lang").isin("en", "de", "fr", "es")),
        ("text_nonempty", F.length("text") > 0),
    ]


def expectations_report_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combined ingest-gate report over both fact-shaped inputs: one
    row per (dataset, rule) with exact violation counts and rates."""
    li = expectations_report(
        read_table(spark, sf_dir, "lineitem"), _lineitem_rules(), "lineitem"
    )
    docs = expectations_report(
        read_table(spark, sf_dir, "documents"),
        _documents_rules(),
        "documents",
    )
    return li.unionByName(docs)


_LI_RULES_SQL = [
    ("quantity_positive", "l_quantity > 0"),
    ("quantity_le_40", "l_quantity <= 40"),
    ("discount_policy_5pct", "l_discount <= 0.05"),
    ("tax_le_6pct", "l_tax <= 0.06"),
    ("price_positive", "l_extendedprice > 0"),
    ("returnflag_domain", "l_returnflag IN ('A', 'N', 'R')"),
]

_DOC_RULES_SQL = [
    ("min_200_chars", "n_chars >= 200"),
    ("nchars_consistent", "n_chars = length(text)"),
    ("lang_known", "lang IN ('en', 'de', 'fr', 'es')"),
    ("text_nonempty", "length(text) > 0"),
]


def _report_sql(table: str, rules: list[tuple[str, str]]) -> str:
    branches = "\nUNION ALL\n".join(
        f"""SELECT '{table}' AS dataset, '{name}' AS rule,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE ({cond}) IS NOT TRUE) AS BIGINT)
           AS n_violations,
       CAST(COUNT(*) FILTER (WHERE ({cond}) IS NOT TRUE) AS DOUBLE)
           / COUNT(*) AS violation_rate
FROM {table}"""
        for name, cond in rules
    )
    return branches


EXPECTATIONS_REPORT_ALL_SQL = (
    _report_sql("lineitem", _LI_RULES_SQL)
    + "\nUNION ALL\n"
    + _report_sql("documents", _DOC_RULES_SQL)
)


def documents_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quarantine side of the documents ingest gate: each rejected
    doc with its violated-rule list (rule-order deterministic) — what a
    pipeline writes to the quarantine sink for triage."""
    annotated = apply_expectations(
        read_table(spark, sf_dir, "documents"), _documents_rules()
    )
    _, bad = split_quarantine(annotated)
    return bad.select("doc_id", "source", "lang", "n_chars", "violations")


DOCUMENTS_QUARANTINE_SQL = f"""
WITH annotated AS (
  SELECT doc_id, source, lang, n_chars,
         array_to_string(list_filter([
             {", ".join(f"CASE WHEN ({cond}) IS NOT TRUE THEN '{name}' END"
                        for name, cond in _DOC_RULES_SQL)}
         ], x -> x IS NOT NULL), ',') AS violations
  FROM documents
)
SELECT * FROM annotated WHERE violations <> ''
"""


ORACLES: dict[str, str] = {
    "expectations_report_all": EXPECTATIONS_REPORT_ALL_SQL,
    "documents_quarantine": DOCUMENTS_QUARANTINE_SQL,
}

QUERIES = {
    "expectations_report_all": expectations_report_all,
    "documents_quarantine": documents_quarantine,
}
