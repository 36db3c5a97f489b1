"""Iterative graph analytics on the co-purchase graph: PageRank by power
iteration, DataFrame-native.

The reference's basket analysis stops at pairwise co-occurrence counts
(``MarketBasketAnalysis.java`` §3.3); ranking products by co-purchase
centrality is the canonical next step and exercises the one execution
shape the rest of the engine doesn't: a DRIVER-CONTROLLED iterative
dataflow (Pregel-style), each step a pure DataFrame join + aggregate.

Scale notes:
- Edges come from the same order-pair explode as ``basket_pairs`` and are
  symmetrized, so every node has degree ≥ 1 (no dangling-mass term).
- Each iteration is one join (ranks ⋈ edges on src — both sides hash-
  partitioned on the same key, so AQE reuses the exchange) and one
  groupBy(dst) — 2 shuffles/iter, the textbook distributed PR cost.
- Lineage grows linearly with iterations; at production iteration counts
  (>~15) insert ``localCheckpoint()`` every few steps to truncate the
  plan.  ``N_ITERATIONS`` here is fixed and small, so the plan stays
  compilable and the whole run is lazy until the sink.
- Rows-only in the driver gate (iterative FP accumulation has no stable
  cross-engine SQL mirror); ``tests/test_graph.py`` asserts the
  invariants instead: mass conservation (Σrank = N up to FP noise),
  positivity, and agreement with a NumPy dense-power-iteration oracle at
  sf0.001.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from retail_sales_project_bigdata_spark.sources import read_table

DAMPING = 0.85
N_ITERATIONS = 5
PAGERANK_TOP_N = 50


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (src, dst) part pairs that co-occur in an order."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PAGERANK_TOP_N} parts by PageRank over the co-purchase graph
    ({N_ITERATIONS} damped power iterations; deterministic tie-break on
    part key)."""
    # No persist: the edge subtree repeats identically in every iteration,
    # and ReuseExchange dedups identical exchanges — measured A/B, caching
    # is ~2× SLOWER here (materialization + storage-read beat by exchange
    # reuse).  See the shuffle_hash hint below for the join-side choice.
    edges = copurchase_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg")
    ranks = nodes.select(
        "node", "deg", F.lit(1.0).alias("rank")
    )
    base = 1.0 - DAMPING
    for _ in range(N_ITERATIONS):
        # Join strategy is part of the design: edges is the FACT side —
        # never broadcast it.  The hint pins a shuffle-hash join building
        # on the |V|-sized rank share, which also skips re-SORTING the
        # edge side every iteration (the sort-merge default's cost here,
        # ~2× the whole query).  Both sides hash-partition on src; the
        # exchange is reused across iterations.
        contribs = (
            edges.join(
                ranks.select(
                    F.col("node").alias("src"),
                    (F.col("rank") / F.col("deg")).alias("share"),
                ).hint("shuffle_hash"),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("share").alias("incoming"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                "deg",
                (
                    F.lit(base)
                    + F.lit(DAMPING) * F.coalesce("incoming", F.lit(0.0))
                ).alias("rank"),
            )
        )
    return (
        ranks.select("node", "rank")
        .orderBy(F.desc("rank"), F.asc("node"))
        .limit(PAGERANK_TOP_N)
    )


ORACLES: dict[str, str] = {}

QUERIES = {
    "pagerank_copurchase": pagerank_copurchase,
}


MAX_STAR_ROUNDS = 30


def _edge_sets_equal(a: DataFrame, b: DataFrame) -> bool:
    """EXACT distinct-edge-set equality for the convergence check: count
    parity plus an empty one-sided difference (both sets are distinct by
    construction, so A⊆B ∧ |A|=|B| ⇒ A=B).  Two small jobs per round —
    a hash-sum fingerprint would be one job but can collide and
    terminate contraction before the fixed point, silently returning
    non-minimum labels."""
    if a.count() != b.count():
        return False
    return b.subtract(a).limit(1).count() == 0


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the WEB-SCALE path the plain min-label propagation in
    ``datasetops.dedup_groups`` documents as its upgrade: each round
    halves component diameter (O(log d) rounds on chains, where label
    propagation needs O(d)), and every round is two groupBy shuffles
    over the current edge set.

    - large-star: each node links its LARGER neighbors to its minimum
      neighborhood member;
    - small-star: edges oriented high→low; each node links its smaller
      neighbors (and itself) to that minimum.

    Converges when the distinct edge set is stable (exact set-equality
    check — see ``_edge_sets_equal``);
    ``localCheckpoint`` truncates lineage per round.  Returns
    (node, component) with component = the component's minimum node id.
    """
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"),
            F.col(dst).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(cur: DataFrame) -> DataFrame:
        nbrs = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        m = nbrs.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            nbrs.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(cur: DataFrame) -> DataFrame:
        oriented = cur.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        m = oriented.groupBy("u").agg(F.min("v").alias("m"))
        linked = (
            oriented.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_link = m.select("u", F.col("m").alias("v"))
        return (
            linked.unionByName(self_link)
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    for _ in range(MAX_STAR_ROUNDS):
        prev = e
        e = small_star(large_star(e)).localCheckpoint()
        if _edge_sets_equal(prev, e):
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {MAX_STAR_ROUNDS} rounds"
        )

    # At the fixed point every edge points node → component minimum; nodes
    # that appear only as a minimum map to themselves.
    nodes = e.select(F.col("u").alias("node")).unionByName(
        e.select(F.col("v").alias("node"))
    ).distinct()
    labels = e.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("component")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
