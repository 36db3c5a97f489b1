"""Hybrid retrieval: reciprocal-rank fusion of a dense (embedding-cosine)
ranklist and a lexical (query-term coverage) ranklist for the same query
set — the RAG/decontamination retrieval shape a training-data pipeline
runs where neither modality alone suffices (dense misses rare literals,
lexical misses paraphrase).

The query set is the first ``N_QUERY_VECS`` documents: ``doc_id`` and
``vec_id`` share the id space in the testdata, so each query has both a
text form (for the lexical leg) and an embedding (for the dense leg) —
the standard "query goes through both encoders" setup.

Engine-exactness: both legs avoid libm in scoring (fold dot products +
``pround``; integer term-count sums with ONE final divide), and the RRF
score is a sum of exactly TWO IEEE divides — deterministic, no
addition-order hazard — so the fused output is DuckDB-hash exact.

Scale design (100 TB): query terms and query vectors are broadcast; the
corpus legs are each one hash agg + broadcast-semi-joined scan; per-query
ranking windows partition on q_id and plan as WindowGroupLimit (partial
top-k before the shuffle).  The fusion join is candidate-sized
(|queries| x depth), trivially broadcast.  No reference twin — north-star
retrieval op (reference has no retrieval surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from retail_sales_project_bigdata_spark.functions import pround
from retail_sales_project_bigdata_spark.operators.similarity import (
    N_QUERY_VECS,
    _dot_expr,
    _vectors,
)
from retail_sales_project_bigdata_spark.operators.textstats import (
    _TOKENIZE,
    _tokens,
)
from retail_sales_project_bigdata_spark.sources import fan_out, read_table

RRF_K = 60  # the standard RRF damping constant (Cormack et al.)
RRF_DEPTH = 50  # candidates taken from each leg before fusion
RRF_TOP_K = 10  # fused results returned per query


def _dense_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query cosine ranklist (top RRF_DEPTH), exact brute force —
    same shape as ``ann_bruteforce_topk``: broadcast queries x
    partitioned corpus, rank window per q_id."""
    vecs = _vectors(spark, sf_dir)
    queries = vecs.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_v"),
        F.col("norm").alias("q_norm"),
    )
    scored = (
        vecs.select(F.col("vec_id").alias("doc_id"), "v", "norm")
        .crossJoin(F.broadcast(queries))
        .filter(F.col("doc_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            pround(
                _dot_expr("q_v", "v") / (F.col("q_norm") * F.col("norm")), 6
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("doc_id"))
    return (
        scored.withColumn("dense_rank", F.row_number().over(w))
        .filter(F.col("dense_rank") <= RRF_DEPTH)
        .select("q_id", "doc_id", "dense_rank")
    )


def _lexical_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query lexical ranklist by query-term coverage density:
    ``sum(tf over matched query terms) / doc_len`` — an exact rational
    score (BIGINT sum, one divide), the log-free twin of BM25 used so
    the fused output stays oracle-exact (``bm25_topk`` keeps the true
    idf scoring as the rows-only production leg)."""
    docs = fan_out(read_table(spark, sf_dir, "documents")).select(
        "doc_id", _tokens().alias("toks")
    )
    tf = (
        docs.select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.explode("toks").alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    q_terms = (
        docs.filter(F.col("doc_id") < N_QUERY_VECS)
        .select(
            F.col("doc_id").alias("q_id"), F.explode("toks").alias("term")
        )
        .distinct()
    )
    scored = (
        tf.join(F.broadcast(q_terms), "term")
        .filter(F.col("doc_id") != F.col("q_id"))
        .groupBy("q_id", "doc_id", "dl")
        .agg(F.sum("tf").alias("matched_tf"))
        .select(
            "q_id",
            "doc_id",
            (F.col("matched_tf").cast("double") / F.col("dl")).alias(
                "coverage"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("coverage"), F.asc("doc_id")
    )
    return (
        scored.withColumn("lex_rank", F.row_number().over(w))
        .filter(F.col("lex_rank") <= RRF_DEPTH)
        .select("q_id", "doc_id", "lex_rank")
    )


def rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused top-{RRF_TOP_K} per query: full-outer join of the two
    ranklists on (q_id, doc_id); RRF score
    ``1/(K+dense_rank) + 1/(K+lex_rank)`` with a missing leg contributing
    0.  Exactly two IEEE divides and one add — deterministic across
    engines, so no rounding is needed before the final rank."""
    dense = _dense_ranks(spark, sf_dir)
    lex = _lexical_ranks(spark, sf_dir)
    fused = (
        dense.join(lex, ["q_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0)
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= RRF_TOP_K)
        .select(
            "q_id", "doc_id", "dense_rank", "lex_rank", "rrf_score",
            "fused_rank",
        )
    )


RRF_HYBRID_TOPK_SQL = f"""
WITH vecs AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
),
q AS (
  SELECT vec_id AS q_id, v AS q_v, norm AS q_norm
  FROM vecs WHERE vec_id < {N_QUERY_VECS}
),
dense_scored AS (
  SELECT q.q_id, c.vec_id AS doc_id,
         ROUND(list_dot_product(q.q_v, c.v) / (q.q_norm * c.norm), 6)
           AS cosine
  FROM q CROSS JOIN vecs c
  WHERE c.vec_id <> q.q_id
),
dense AS (
  SELECT q_id, doc_id, CAST(dr AS INT) AS dense_rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY cosine DESC, doc_id ASC) AS dr
    FROM dense_scored
  ) WHERE dr <= {RRF_DEPTH}
),
toks AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '{_TOKENIZE}') AS t
  FROM documents
),
tf AS (
  SELECT doc_id, len(t) AS dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, t, unnest(t) AS term FROM toks)
  GROUP BY doc_id, dl, term
),
q_terms AS (
  SELECT DISTINCT doc_id AS q_id, unnest(t) AS term
  FROM toks WHERE doc_id < {N_QUERY_VECS}
),
lex_scored AS (
  SELECT qt.q_id, f.doc_id,
         CAST(SUM(f.tf) AS DOUBLE) / ANY_VALUE(f.dl) AS coverage
  FROM tf f JOIN q_terms qt USING (term)
  WHERE f.doc_id <> qt.q_id
  GROUP BY qt.q_id, f.doc_id
),
lex AS (
  SELECT q_id, doc_id, CAST(lr AS INT) AS lex_rank FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY q_id ORDER BY coverage DESC, doc_id ASC) AS lr
    FROM lex_scored
  ) WHERE lr <= {RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(d.q_id, l.q_id) AS q_id,
         COALESCE(d.doc_id, l.doc_id) AS doc_id,
         d.dense_rank, l.lex_rank,
         COALESCE(1.0 / ({RRF_K} + d.dense_rank), 0.0)
           + COALESCE(1.0 / ({RRF_K} + l.lex_rank), 0.0) AS rrf_score
  FROM dense d FULL OUTER JOIN lex l
    ON d.q_id = l.q_id AND d.doc_id = l.doc_id
)
SELECT q_id, doc_id, dense_rank, lex_rank, rrf_score,
       CAST(fr AS INT) AS fused_rank
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY q_id ORDER BY rrf_score DESC, doc_id ASC) AS fr
  FROM fused
)
WHERE fr <= {RRF_TOP_K}
"""


ORACLES: dict[str, str] = {
    "rrf_hybrid_topk": RRF_HYBRID_TOPK_SQL,
}

QUERIES = {
    "rrf_hybrid_topk": rrf_hybrid_topk,
}
