"""Distributed model-evaluation operators — exact AUC and a calibration
/ lift table, run at corpus scale with NO single-task bottleneck.

The reference's only model metric is a driver-side
``BinaryClassificationEvaluator`` call on a fitted pipeline
(``ChurnPrediction.java`` evaluation step; see ``ml/pipelines``).  These
operators make evaluation itself a first-class distributed query: score
a deterministic quality signal (``unigram_freq_scores``' engine-exact
rational proxy) against a balanced deterministic label (``lang = 'en'``
— the heuristic ``is_quality`` flag is single-class on the clean
synthetic corpus, a degenerate evaluation) so the WHOLE evaluation —
not just the model — is value-checkable against DuckDB.

- :func:`quality_score_auc`: Mann-Whitney AUC with the exact tie
  correction (average ranks).  AUC is computed from per-distinct-score
  counts and ONE distributed prefix sum — never a global sort of the
  scored corpus:

      2·R⁺ = Σ_s  n⁺(s) · (2·cum_before(s) + n(s) + 1)
      AUC  = (2·R⁺ − n⁺(n⁺+1)) / (2 · n⁺ · n⁻)

  Every term is an exact integer (decimal(38,0)/HUGEINT for the
  products — two 1e12-scale counts multiply to 1e24 ≪ 1e38); the single
  final division is the only float op, so both engines emit the
  identical double.

- :func:`quality_score_calibration`: rank-based decile lift table
  (NTILE(10) over (score, doc_id) — the unique tiebreak makes rank
  deciles engine-deterministic even with heavily tied scores).  Ranks
  come from :mod:`operators.ranking`'s two-phase formulation, so a
  trillion-row scored corpus never funnels through one WindowExec task.

Scale: the per-score aggregate is score-domain-sized (≪ rows); the
prefix sum is one range exchange; the calibration path is the
two-phase global ranking (range exchange + partitioned window +
broadcast offsets) plus a 10-group rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.functions import pround
from retail_sales_project_bigdata_spark.operators.ranking import (
    global_row_number,
    grouped_prefix_sum,
    ntile_from_rn,
    with_total_count,
)
from retail_sales_project_bigdata_spark.operators.textstats import (
    unigram_freq_scores,
)
from retail_sales_project_bigdata_spark.sources import read_table

_D38 = "decimal(38,0)"

CALIBRATION_TILES = 10


def _scored_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, label): mean corpus-frequency proxy vs the
    balanced ``lang = 'en'`` label (English docs share the corpus's
    dominant token pool, so their mean frequency skews high — a real,
    non-degenerate separation for the AUC to measure; ``is_quality``
    is single-class on this clean corpus and would divide by zero)."""
    scores = unigram_freq_scores(spark, sf_dir).select("doc_id", "mean_freq")
    labels = read_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("label")
    )
    return scores.join(labels, "doc_id").select(
        "doc_id", F.col("mean_freq").alias("score"), "label"
    )


def quality_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected Mann-Whitney AUC of the unigram-frequency
    quality proxy against the ``lang = 'en'`` label (one row:
    n_pos, n_neg, auc, gini)."""
    sl = _scored_labels(spark, sf_dir)
    per_score = sl.groupBy("score").agg(
        F.count(F.lit(1)).alias("c_tot"),
        F.sum("label").alias("c_pos"),
    )
    cum = grouped_prefix_sum(
        per_score, [], [F.asc("score")], "c_tot", "cum_before", exclusive=True
    )
    # Σ n⁺(s)·(2·cum_before + n(s) + 1), exact in decimal(38,0)
    two_r_pos = F.sum(
        F.col("c_pos").cast(_D38)
        * (2 * F.col("cum_before") + F.col("c_tot") + 1).cast(_D38)
    )
    tot = cum.agg(
        F.sum("c_pos").cast("long").alias("n_pos"),
        (F.sum("c_tot") - F.sum("c_pos")).cast("long").alias("n_neg"),
        two_r_pos.alias("two_r_pos"),
    )
    auc = (
        tot["two_r_pos"]
        - tot["n_pos"].cast(_D38) * (tot["n_pos"] + 1).cast(_D38)
    ).cast("double") / (
        F.lit(2.0) * tot["n_pos"].cast("double") * tot["n_neg"].cast("double")
    )
    return tot.select(
        "n_pos",
        "n_neg",
        pround(auc, 6).alias("auc"),
        pround(F.lit(2.0) * auc - F.lit(1.0), 6).alias("gini"),
    )


QUALITY_SCORE_AUC_SQL = """
WITH scores AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS score
  FROM (
    SELECT p.doc_id, c.cnt
    FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[ ]+')) AS token
          FROM documents) p
    JOIN (SELECT token, COUNT(*) AS cnt
          FROM (SELECT unnest(regexp_split_to_array(lower(text), '[ ]+')) AS token
                FROM documents) GROUP BY token) c USING (token)
  ) GROUP BY doc_id
),
labels AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
),
sl AS (SELECT s.score, l.label FROM scores s JOIN labels l USING (doc_id)),
per_score AS (
  SELECT score, COUNT(*) AS c_tot, SUM(label) AS c_pos
  FROM sl GROUP BY score
),
cum AS (
  SELECT score, c_tot, c_pos,
         COALESCE(SUM(c_tot) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM per_score
),
tot AS (
  SELECT CAST(SUM(c_pos) AS BIGINT) AS n_pos,
         CAST(SUM(c_tot) - SUM(c_pos) AS BIGINT) AS n_neg,
         SUM(CAST(c_pos AS HUGEINT)
             * CAST(2 * cum_before + c_tot + 1 AS HUGEINT)) AS two_r_pos
  FROM cum
)
SELECT n_pos, n_neg,
       ROUND(CAST(two_r_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6)
         AS auc,
       ROUND(2.0 * (CAST(two_r_pos - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) - 1.0, 6)
         AS gini
FROM tot
"""


def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile calibration / lift table: rank-NTILE(10) of the score
    (doc_id tiebreak), per decile the doc count, positive count,
    positive rate, and the score band — the table that decides where a
    quality-filter threshold actually lands."""
    sl = _scored_labels(spark, sf_dir)
    ranked = with_total_count(
        global_row_number(sl, [F.asc("score"), F.asc("doc_id")], "rn")
    )
    tiled = ranked.withColumn(
        "decile", ntile_from_rn(F.col("rn"), F.col("_n_total"), CALIBRATION_TILES)
    )
    agg = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("label").alias("n_pos"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )
    return agg.select(
        "decile",
        "n_docs",
        "n_pos",
        pround(
            F.col("n_pos").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("pos_rate"),
        pround("min_score", 6).alias("min_score"),
        pround("max_score", 6).alias("max_score"),
    )


QUALITY_SCORE_CALIBRATION_SQL = """
WITH scores AS (
  SELECT doc_id,
         CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS score
  FROM (
    SELECT p.doc_id, c.cnt
    FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[ ]+')) AS token
          FROM documents) p
    JOIN (SELECT token, COUNT(*) AS cnt
          FROM (SELECT unnest(regexp_split_to_array(lower(text), '[ ]+')) AS token
                FROM documents) GROUP BY token) c USING (token)
  ) GROUP BY doc_id
),
labels AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS label
  FROM documents
),
sl AS (
  SELECT s.doc_id, s.score, l.label
  FROM scores s JOIN labels l USING (doc_id)
),
tiled AS (
  SELECT score, label,
         NTILE({tiles}) OVER (ORDER BY score, doc_id) AS decile
  FROM sl
)
SELECT decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(label) AS BIGINT) AS n_pos,
       ROUND(CAST(SUM(label) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
       ROUND(MIN(score), 6) AS min_score,
       ROUND(MAX(score), 6) AS max_score
FROM tiled GROUP BY decile
"""


ORACLES: dict[str, str] = {
    "quality_score_auc": QUALITY_SCORE_AUC_SQL,
    "quality_score_calibration": QUALITY_SCORE_CALIBRATION_SQL.format(
        tiles=CALIBRATION_TILES
    ),
}

QUERIES = {
    "quality_score_auc": quality_score_auc,
    "quality_score_calibration": quality_score_calibration,
}
