"""Empty-input robustness sweep: every iterative/aggregating operator
must return an EMPTY typed frame on an empty input — never
ZeroDivisionError, never NULL-poisoned rows (the r4-advice
hits_fixed(n=0) bug class, preempted for the whole family)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_edges(spark):
    return spark.createDataFrame([], "src long, dst long")


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_graph_algorithms_on_empty_graph(spark, empty_edges):
    from binaryx_graph_spark.operators.graphalgo import (
        betweenness_sampled,
        community_modularity,
        hits_fixed,
        kcore_peel,
        label_propagation,
        pagerank_fixed,
        triangle_counts,
    )

    for fn in (
        pagerank_fixed,
        hits_fixed,
        triangle_counts,
        kcore_peel,
        label_propagation,
        community_modularity,
        betweenness_sampled,
    ):
        out = fn(empty_edges)
        assert out.count() == 0, fn.__name__
        # schema intact: collect() on empty frame round-trips
        assert out.columns, fn.__name__


def test_traversal_on_empty_graph(spark):
    from binaryx_graph_spark.operators.traverse import (
        enumerate_paths,
        indirect_recursion,
        reachable,
    )

    calls = spark.createDataFrame(
        [], "src_uid string, dst_uid string, offset string, call_type string"
    )
    fns = spark.createDataFrame(
        [], "uid string, name string, address string, size long, type string"
    )
    seeds = spark.createDataFrame([("a",)], "uid string")
    assert reachable(calls, seeds, max_depth=3).count() == 0
    assert enumerate_paths(calls, fns, seeds, max_depth=3).count() == 0
    assert indirect_recursion(calls, seeds, max_depth=5).count() == 0


def test_dedup_on_empty_corpus(spark, empty_docs):
    from binaryx_graph_spark.operators.dedup import (
        connected_components,
        exact_dedup_groups,
        jaccard_pairs_prefix,
        minhash_near_dup,
        paragraph_dedup,
        simhash_near_dup,
    )

    assert exact_dedup_groups(empty_docs, "doc_id", F.col("text")).count() == 0
    assert minhash_near_dup(empty_docs, "doc_id", "text").count() == 0
    assert simhash_near_dup(empty_docs, "doc_id", "text").count() == 0
    assert jaccard_pairs_prefix(empty_docs, "doc_id", "text").count() == 0
    assert paragraph_dedup(empty_docs, "doc_id", "text").count() == 0
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(pairs).count() == 0


def test_textstats_on_empty_corpus(spark, empty_docs):
    from binaryx_graph_spark.operators.textstats import (
        bigram_lm_surprisal,
        bm25_topk,
        chunk_overlap,
        frequent_ngrams,
        unigram_surprisal,
    )

    assert unigram_surprisal(empty_docs).count() == 0
    assert bigram_lm_surprisal(empty_docs).count() == 0
    assert bm25_topk(empty_docs, ["spark"]).count() == 0
    assert chunk_overlap(empty_docs).count() == 0
    assert frequent_ngrams(empty_docs).count() == 0


def test_similarity_on_empty_embeddings(spark):
    from binaryx_graph_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf,
        cosine_topk_lsh,
        cosine_topk_pq,
    )

    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert cosine_topk(emb, 1, k=5).count() == 0
    assert cosine_topk_lsh(emb, 1, k=5).count() == 0
    assert cosine_topk_ivf(emb, 1, k=5).count() == 0
    assert cosine_topk_pq(emb, 1, k=5).count() == 0


def test_personalized_pagerank_empty_seeds(spark, empty_edges):
    from pyspark.sql import functions as F

    from binaryx_graph_spark.operators.graphalgo import personalized_pagerank_fixed

    # empty graph
    assert personalized_pagerank_fixed(empty_edges, F.col("v") >= 0).count() == 0
    # non-empty graph, seed predicate matching nothing
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    assert personalized_pagerank_fixed(e, F.col("v") > 99).count() == 0


def test_streaming_cdc_on_empty_corpus(spark, tmp_path):
    """r5 ADVICE: max(doc_id) is None on an empty documents table —
    must return the empty typed index frame, not TypeError."""
    from binaryx_graph_spark.streaming.dedup_stream import streaming_cdc_dedup

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf_dir}/documents.parquet")
    stats: dict = {}
    out = streaming_cdc_dedup(spark, sf_dir, stats=stats)
    assert out.count() == 0
    assert out.columns == ["chunk_md5", "n_tokens", "n_occurrences", "n_docs"]
    assert stats == {"n_batches": 0, "index_size": 0}


def test_frequent_ngrams_custom_id_col(spark):
    """r5 ADVICE: id_col is a parameter (default doc_id), so frames
    with a differently-named id column work without pre-renaming."""
    from binaryx_graph_spark.operators.textstats import frequent_ngrams

    rows = [(1, "a b c a b c"), (2, "a b c x y z")]
    named = spark.createDataFrame(rows, "item_id long, text string")
    default = spark.createDataFrame(rows, "doc_id long, text string")
    got = {tuple(r) for r in frequent_ngrams(named, "text", "item_id", n=3, k=5).collect()}
    want = {tuple(r) for r in frequent_ngrams(default, "text", n=3, k=5).collect()}
    assert got == want and got  # same result, non-empty
