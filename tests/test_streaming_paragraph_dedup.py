"""Streaming paragraph dedup: multi-batch drain pinned equal to the
global batch pass, index growth, cross-batch suppression."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.dedup import paragraph_dedup
from binaryx_graph_spark.streaming.dedup_stream import streaming_paragraph_dedup

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["doc_id"], r["n_paras"], r["n_kept"], r["cleaned_text"]) for r in df.collect()
    )


def test_streaming_equals_global_batch_pass(spark):
    stats: dict = {}
    streamed = streaming_paragraph_dedup(spark, SF_DIR, arrival_batches=3, stats=stats)
    from binaryx_graph_spark.model import load_table

    docs = load_table(spark, SF_DIR, "documents")
    batch = paragraph_dedup(docs, "doc_id", "text")
    assert _rows(streamed) == _rows(batch)
    # prove the drain really ran as 3 non-trivial micro-batches
    assert stats["n_batches"] == 3
    assert all(n > 0 for n in stats["docs_per_batch"])
    # the accumulated index is exactly the kept-paragraph count
    assert stats["index_size"] == sum(r[2] for r in _rows(batch))


def test_incremental_cross_batch_suppression(spark):
    """A paragraph kept in batch 1 must be dropped when batch 2 repeats
    it, even at batch-2-first position."""
    from binaryx_graph_spark.operators.dedup import incremental_paragraph_dedup

    b1 = spark.createDataFrame([(1, "aa bb cc dd")], "doc_id bigint, text string")
    b2 = spark.createDataFrame([(2, "aa bb ee ff")], "doc_id bigint, text string")
    idx0 = spark.createDataFrame([], "para string")
    r1, fresh1 = incremental_paragraph_dedup(b1, idx0, words=2)
    idx1 = idx0.unionByName(fresh1)
    r2, _ = incremental_paragraph_dedup(b2, idx1, words=2)
    (row1,) = r1.collect()
    (row2,) = r2.collect()
    assert row1["cleaned_text"] == "aa bb cc dd"
    assert row2["cleaned_text"] == "ee ff" and row2["n_kept"] == 1
