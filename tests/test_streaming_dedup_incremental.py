"""Streaming continuous dedup == global batch MinHash pass, and the
drain really runs as multiple micro-batches."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.dedup import minhash_near_dup
from binaryx_graph_spark.streaming.dedup_stream import streaming_incremental_dedup

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_a"], r["n_b"], round(r["jaccard"], 12))
        for r in df.collect()
    )


def test_streaming_union_equals_global_and_batches_are_real(spark):
    stats: dict = {}
    got = _rows(
        streaming_incremental_dedup(
            spark, SF, n=3, threshold=0.3, arrival_batches=3, stats=stats
        )
    )
    docs = load_table(spark, SF, "documents")
    want = _rows(minhash_near_dup(docs, "doc_id", "text", n=3, threshold=0.3))
    assert got == want and len(got) > 0
    # the incremental path must actually run per-batch (a single batch
    # would satisfy the union contract without testing it)
    assert stats["n_batches"] == 3
    # pairs discovered in later batches prove cross-batch (new, old)
    # matches went through the accumulated index
    assert sum(stats["pairs_per_batch"][1:]) > 0
