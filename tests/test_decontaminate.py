"""ngram_decontaminate edge cases beyond the gate query."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.dedup import ngram_decontaminate


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_collision_counts_are_distinct_ngram_hits(spark):
    bench = _df(spark, [(100, "alpha beta gamma delta")])
    docs = _df(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 2 distinct 4-grams... compute
            (2, "unrelated text with nothing shared here at all"),
            (3, "x alpha beta gamma delta"),  # shares 1 (the bench's only 4-gram twice? no: 1)
        ],
    )
    got = {r["doc_id"]: r["n_collisions"] for r in ngram_decontaminate(docs, bench, n=4).collect()}
    # bench has exactly one 4-gram: "alpha beta gamma delta"
    assert got == {1: 1, 3: 1}


def test_empty_benchmark_flags_nothing(spark):
    bench = _df(spark, [])
    docs = _df(spark, [(1, "alpha beta gamma delta epsilon")])
    assert ngram_decontaminate(docs, bench, n=4).count() == 0


def test_short_docs_never_collide(spark):
    # fewer than n tokens -> no n-grams on either side
    bench = _df(spark, [(100, "alpha beta")])
    docs = _df(spark, [(1, "alpha beta")])
    assert ngram_decontaminate(docs, bench, n=4).count() == 0
