"""Incremental MinHash dedup == global MinHash restricted to the batch.

The contract that makes the incremental operator trustworthy: running
the batch against the corpus's precomputed band index must find exactly
the pairs a full-corpus MinHash/LSH pass would have found among pairs
touching the batch — same candidates, same verify, same banding
false-negatives.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.dedup import (
    incremental_minhash_near_dup,
    minhash_band_index,
    minhash_near_dup,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_a"], r["n_b"], round(r["jaccard"], 12))
        for r in df.collect()
    )


def test_incremental_equals_global_restricted(spark):
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)

    got = _rows(incremental_minhash_near_dup(new, corpus, "doc_id", "text", n=3, threshold=0.3))
    want = _rows(
        minhash_near_dup(docs, "doc_id", "text", n=3, threshold=0.3).filter(
            (F.col("doc_a") % 7 == 0) | (F.col("doc_b") % 7 == 0)
        )
    )
    assert got == want and len(got) > 0


def test_incremental_accepts_precomputed_index(spark):
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    idx = minhash_band_index(corpus, "doc_id", "text", n=3).localCheckpoint(eager=True)

    with_idx = _rows(
        incremental_minhash_near_dup(
            new, corpus, "doc_id", "text", n=3, threshold=0.3, corpus_bands=idx
        )
    )
    without = _rows(
        incremental_minhash_near_dup(new, corpus, "doc_id", "text", n=3, threshold=0.3)
    )
    assert with_idx == without
