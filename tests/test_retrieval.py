"""Behavioral tests for retrieval.rrf_hybrid_topk and
textstats.lm_perplexity_scores beyond the oracle-parity sweep
(tests/test_oracle_parity.py already value-checks both vs DuckDB):

- the integer bits-per-token surrogate must stay within 1 bit of the
  TRUE add-one bigram cross-entropy (the quantization-error bound the
  docstring claims);
- RRF output must obey the fusion formula and per-query depth/rank
  invariants, and a doc leading BOTH legs must lead the fusion.
"""

from __future__ import annotations

import math
from collections import Counter

from tests.conftest import SF_SMALL


def test_lm_bits_within_one_of_true_entropy(spark):
    from retail_sales_project_bigdata_spark.operators.textstats import (
        lm_perplexity_scores,
    )

    rows = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    toks = {r.doc_id: r.text.lower().split() for r in rows}
    bigrams = Counter()
    ctx_tot = Counter()
    vocab = set()
    for ts in toks.values():
        vocab.update(ts)
        for a, b in zip(ts, ts[1:]):
            bigrams[(a, b)] += 1
            ctx_tot[a] += 1
    v_size = len(vocab)

    got = {
        r.doc_id: r
        for r in lm_perplexity_scores(spark, SF_SMALL).collect()
    }
    checked = 0
    for doc_id, ts in toks.items():
        if len(ts) < 2:
            assert doc_id not in got
            continue
        true_bits = sum(
            -math.log2((bigrams[(a, b)] + 1) / (ctx_tot[a] + v_size))
            for a, b in zip(ts, ts[1:])
        )
        n = len(ts) - 1
        r = got[doc_id]
        assert r.n_bigrams == n
        # floor-log2 of num and den each quantize within [0, 1) bits, so
        # the per-token (and hence mean) error is strictly inside (-1, 1).
        assert abs(r.bits_per_token - true_bits / n) < 1.0, doc_id
        checked += 1
    assert checked > 0


def test_rrf_fusion_invariants(spark):
    from retail_sales_project_bigdata_spark.operators.retrieval import (
        RRF_DEPTH,
        RRF_K,
        RRF_TOP_K,
        _dense_ranks,
        _lexical_ranks,
        rrf_hybrid_topk,
    )

    fused = rrf_hybrid_topk(spark, SF_SMALL).collect()
    dense = {
        (r.q_id, r.doc_id): r.dense_rank
        for r in _dense_ranks(spark, SF_SMALL).collect()
    }
    lex = {
        (r.q_id, r.doc_id): r.lex_rank
        for r in _lexical_ranks(spark, SF_SMALL).collect()
    }

    by_q: dict[int, list] = {}
    for r in fused:
        by_q.setdefault(r.q_id, []).append(r)

    assert by_q, "no fused results"
    for q_id, rs in by_q.items():
        assert len(rs) <= RRF_TOP_K
        ranks = sorted(r.fused_rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        for r in rs:
            d = dense.get((r.q_id, r.doc_id))
            l = lex.get((r.q_id, r.doc_id))
            assert r.dense_rank == d and r.lex_rank == l
            assert d is not None or l is not None
            expect = (1.0 / (RRF_K + d) if d else 0.0) + (
                1.0 / (RRF_K + l) if l else 0.0
            )
            assert r.rrf_score == expect
            assert (d or RRF_DEPTH + 1) <= RRF_DEPTH or (
                l or RRF_DEPTH + 1
            ) <= RRF_DEPTH

    # A doc that tops both legs must top the fusion (RRF dominance).
    for q_id, rs in by_q.items():
        leaders = {
            doc
            for (q, doc), rk in dense.items()
            if q == q_id and rk == 1
        } & {
            doc for (q, doc), rk in lex.items() if q == q_id and rk == 1
        }
        if leaders:
            top = min(rs, key=lambda r: r.fused_rank)
            assert top.doc_id in leaders


def test_rrf_legs_plan_as_window_group_limit(spark):
    """Both RRF legs' per-query rank windows must plan as
    WindowGroupLimit (map-side partial top-k before the shuffle) — the
    same plan contract bm25_topk and ngram_lm_counts already assert; a
    planner regression to a full per-partition window would otherwise
    ship every (q_id, doc_id) score through the exchange."""
    from retail_sales_project_bigdata_spark.operators.retrieval import (
        _dense_ranks,
        _lexical_ranks,
        rrf_hybrid_topk,
    )
    from retail_sales_project_bigdata_spark.plans import physical_plan

    assert "WindowGroupLimit" in physical_plan(_dense_ranks(spark, SF_SMALL))
    assert "WindowGroupLimit" in physical_plan(
        _lexical_ranks(spark, SF_SMALL)
    )
    # and the fused ranking itself
    assert "WindowGroupLimit" in physical_plan(
        rrf_hybrid_topk(spark, SF_SMALL)
    )
