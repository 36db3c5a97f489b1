"""Invariant tests for the training-dataset assembly ops (datasetops).

Exact values are covered by the DuckDB oracle gate; these assert the
semantic invariants that make the ops *correct as pipeline stages*:
transitive consistency of canonical assignment, split totality, packing
conservation, dense ids.
"""

from __future__ import annotations

from collections import defaultdict

from retail_sales_project_bigdata_spark.operators import datasetops
from retail_sales_project_bigdata_spark.operators.dedup import minhash_lsh_pairs
from tests.conftest import SF_SMALL


def test_dedup_groups_is_a_consistent_components_labeling(spark):
    labels = {
        r.doc_id: r.canonical_id
        for r in datasetops.dedup_groups(spark, SF_SMALL).collect()
    }
    pairs = [
        (r.d1, r.d2) for r in minhash_lsh_pairs(spark, SF_SMALL).collect()
    ]
    assert labels, "near-dup pairs exist at sf0.001 by data design"
    # canonical is the component min: never above the member id...
    assert all(c <= d for d, c in labels.items())
    # ...both endpoints of every edge agree...
    assert all(labels[a] == labels[b] for a, b in pairs)
    # ...and canonicals are fixpoints (label(label(x)) == label(x)).
    assert all(labels[c] == c for c in set(labels.values()))
    # Independent union-find over the same edges gives identical groups.
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in labels}
    assert labels == expected


def test_hash_split_is_total_and_consistent(spark):
    rows = datasetops.hash_split(spark, SF_SMALL).collect()
    assert all(0 <= r.bucket < 100 for r in rows)
    for r in rows:
        if r.bucket < datasetops.TRAIN_PCT:
            assert r.split == "train"
        elif r.bucket < datasetops.TRAIN_PCT + datasetops.VAL_PCT:
            assert r.split == "val"
        else:
            assert r.split == "test"
    # all three splits non-empty and train is the (rough) majority
    by_split = defaultdict(int)
    for r in rows:
        by_split[r.split] += 1
    assert set(by_split) == {"train", "val", "test"}
    assert by_split["train"] > by_split["val"] + by_split["test"]


def test_pack_sequences_conserves_tokens_and_orders_windows(spark):
    rows = datasetops.pack_sequences(spark, SF_SMALL).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: r.start_tok)
        # exclusive prefix sum: each doc starts where the previous ended
        pos = 0
        for r in rs:
            assert r.start_tok == pos, (source, r.doc_id)
            pos += r.n_tokens
            assert r.start_window == r.start_tok // datasetops.CONTEXT_TOKENS
            assert r.end_window == (r.start_tok + r.n_tokens - 1) // datasetops.CONTEXT_TOKENS
            assert r.straddles == int(r.start_window != r.end_window)


def test_stratified_sample_caps_and_ranks(spark):
    rows = datasetops.stratified_sample(spark, SF_SMALL).collect()
    by_source = defaultdict(list)
    for r in rows:
        by_source[r.source].append(r.sample_rank)
    for source, ranks in by_source.items():
        assert len(ranks) <= datasetops.SAMPLE_PER_STRATUM
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), source


def test_vocab_table_ids_dense_and_frequency_ordered(spark):
    rows = sorted(
        datasetops.vocab_table(spark, SF_SMALL).collect(),
        key=lambda r: r.token_id,
    )
    assert [r.token_id for r in rows] == list(range(len(rows)))
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_chunk_documents_reconstruction(spark):
    """Dropping each chunk's overlap prefix (except chunk 0) and
    concatenating in chunk order must reconstruct every document."""
    from retail_sales_project_bigdata_spark.operators.datasetops import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
    )
    from retail_sales_project_bigdata_spark.sources import read_table

    overlap = CHUNK_WORDS - CHUNK_STRIDE
    chunks = datasetops.chunk_documents(spark, SF_SMALL).collect()
    by_doc = defaultdict(list)
    for r in chunks:
        by_doc[r.doc_id].append(r)
    docs = {
        r.doc_id: r.text
        for r in read_table(spark, SF_SMALL, "documents").collect()
    }
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        words = []
        for i, r in enumerate(rows):
            w = r.chunk_text.split(" ") if r.chunk_text else []
            words.extend(w if i == 0 else w[overlap:])
            assert 1 <= r.chunk_words <= CHUNK_WORDS
            assert r.chunk_words == len(w)
        assert " ".join(words) == docs[doc_id], doc_id


def test_dataset_mixture_hits_target_proportions(spark):
    """The kept corpus must match MIX_WEIGHTS proportions to within one
    document per language, never upsample, and be the LARGEST such corpus
    (at least one language fully consumed)."""
    from collections import Counter

    from retail_sales_project_bigdata_spark.operators.datasetops import (
        MIX_WEIGHTS,
    )
    from retail_sales_project_bigdata_spark.sources import read_table

    rows = datasetops.dataset_mixture(spark, SF_SMALL).collect()
    kept = Counter(r.lang for r in rows)
    total = sum(kept.values())
    avail = Counter(
        r.lang
        for r in read_table(spark, SF_SMALL, "documents")
        .select("lang")
        .collect()
    )
    assert set(kept) <= set(MIX_WEIGHTS)
    exhausted = 0
    for lang, n in kept.items():
        assert n <= avail[lang], f"{lang} upsampled"
        # quota = floor(t * w) and total = sum of quotas, so each language
        # sits within one doc of its target share
        assert abs(n - MIX_WEIGHTS[lang] * total) <= 1, (lang, n, total)
        if n >= avail[lang] - 1:  # t = n_lang/w exactly for the argmin lang
            exhausted += 1
    assert exhausted >= 1, "not maximal: no language fully consumed"
    # ranks are the selection order and unique per language
    for lang in kept:
        ranks = sorted(r.mix_rank for r in rows if r.lang == lang)
        assert ranks == list(range(1, kept[lang] + 1))


def test_token_budget_sample_is_a_budgeted_hash_prefix(spark):
    """Kept docs per source must be exactly the md5-order prefix whose
    exclusive token prefix-sum stays under the budget."""
    from retail_sales_project_bigdata_spark.operators.datasetops import (
        TOKEN_BUDGET,
    )
    from retail_sales_project_bigdata_spark.sources import read_table

    kept = datasetops.token_budget_sample(spark, SF_SMALL).collect()
    docs = read_table(spark, SF_SMALL, "documents").collect()
    import hashlib

    by_source = defaultdict(list)
    for r in docs:
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()
        by_source[r.source].append((h, r.doc_id, len(r.text.split(" "))))
    expected = {}
    for source, rows in by_source.items():
        rows.sort()
        cum = 0
        for h, doc_id, n in rows:
            if cum >= TOKEN_BUDGET:
                break
            expected[(doc_id, source)] = (n, cum)
            cum += n
    got = {(r.doc_id, r.source): (r.n_tokens, r.tokens_before) for r in kept}
    assert got == expected
    for r in kept:
        assert r.tokens_before < TOKEN_BUDGET


def test_build_training_dataset_end_to_end(spark, tmp_path):
    """The composed corpus build must shrink monotonically per stage,
    partition the kept set across splits, and publish atomically
    versioned snapshots."""
    from retail_sales_project_bigdata_spark.operators.datasetops import (
        build_training_dataset,
    )
    from retail_sales_project_bigdata_spark.sources import read_versioned

    out = str(tmp_path / "corpus_build")
    m = build_training_dataset(spark, SF_SMALL, out)
    assert m["version"] == 1
    assert m["n_kept_docs"] <= m["n_quality_docs"] <= m["n_total_docs"]
    assert sum(m["splits"].values()) == m["n_kept_docs"]
    assert set(m["splits"]) <= {"train", "val", "test"}
    assert m["kept_tokens"] > 0

    published = read_versioned(spark, out + "/corpus")
    assert published.count() == m["n_kept_docs"]
    # no duplicate canonical content survives: exact texts are unique
    assert published.select("text").distinct().count() == m["n_kept_docs"]
    # published layout is split-partitioned (hive dirs under v=1)
    import os

    v1 = os.path.join(out, "corpus", "v=1")
    assert any(d.startswith("split=") for d in os.listdir(v1))
    # exactly one kept representative per near-dup component
    assert (
        published.select("canonical_id").distinct().count()
        == m["n_kept_docs"]
    )

    # rerun: new version, v1 untouched
    m2 = build_training_dataset(spark, SF_SMALL, out)
    assert m2["version"] == 2
    assert read_versioned(spark, out + "/corpus", 1).count() == m["n_kept_docs"]


def test_temperature_mixture_sample(spark, duck):
    import math

    from pyspark.sql import functions as F

    from tests.conftest import assert_oracle_match
    from retail_sales_project_bigdata_spark.operators.datasetops import (
        TEMPERATURE_MIXTURE_SAMPLE_SQL,
        temperature_mixture_sample,
    )
    from retail_sales_project_bigdata_spark.sources import read_table

    df = temperature_mixture_sample(spark, SF_SMALL)
    assert_oracle_match(df, duck, TEMPERATURE_MIXTURE_SAMPLE_SQL)

    rows = df.collect()
    raw = {
        r["source"]: r["n"]
        for r in read_table(spark, SF_SMALL, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    kept = {}
    for r in rows:
        kept[r["source"]] = kept.get(r["source"], 0) + 1
        assert 1 <= r["mix_rank"] <= r["quota"] <= r["n_docs"]
    # every source is sampled, none upsampled, quotas match the formula
    n_min = min(raw.values())
    for src, n in raw.items():
        assert kept[src] == min(n, math.floor(math.sqrt(n * n_min)))
    # the smallest source is kept WHOLE (exact-product quota: the
    # binding source's product is a perfect square, so no float
    # rounding can drop a doc from the source the rule up-weights)
    binding = min(raw, key=raw.get)
    assert kept[binding] == raw[binding]
    # shares are flatter than raw: the max/min kept ratio must not
    # exceed the raw max/min ratio
    raw_ratio = max(raw.values()) / min(raw.values())
    kept_ratio = max(kept.values()) / min(kept.values())
    assert kept_ratio <= raw_ratio + 1e-9


def test_source_novelty(spark, duck):
    from tests.conftest import assert_oracle_match
    from retail_sales_project_bigdata_spark.operators.datasetops import (
        SOURCE_NOVELTY_SQL,
        source_novelty,
    )
    from retail_sales_project_bigdata_spark.sources import read_table

    df = source_novelty(spark, SF_SMALL)
    assert_oracle_match(df, duck, SOURCE_NOVELTY_SQL)

    rows = df.collect()
    n_sources = (
        read_table(spark, SF_SMALL, "documents")
        .filter("text is not null")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources
    for r in rows:
        assert 0 <= r["n_exclusive_types"] <= r["n_shingle_types"]
        assert 0.0 <= r["exclusive_share"] <= 1.0
