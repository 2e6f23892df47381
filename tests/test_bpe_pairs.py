"""BPE merge-step pair counting: known frequencies, single-char words,
corpus weighting through the word dictionary."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import bpe_pair_counts


def test_bpe_pairs_known_counts(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ba x"), (2, "abc AB")], "doc_id bigint, text string"
    )
    # word counts (lowercased): ab=3, ba=1, x=1, abc=1
    # pairs: 'a b' from ab(3) + abc(1) = 4 over 2 words; 'b a' from ba(1);
    # 'b c' from abc(1); 'x' has no pair
    got = {
        r["pair"]: (r["pair_count"], r["n_words"])
        for r in bpe_pair_counts(docs).collect()
    }
    assert got == {"a b": (4, 2), "b a": (1, 1), "b c": (1, 1)}


def test_bpe_pairs_empty_and_short(spark):
    docs = spark.createDataFrame([(1, ""), (2, "a b c")], "doc_id bigint, text string")
    assert bpe_pair_counts(docs).count() == 0  # only 1-char words
