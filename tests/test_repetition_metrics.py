"""Repetition metrics edge cases: empty/short docs, known fractions."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import repetition_metrics


def test_repetition_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # 3-grams: aba bab aba bab -> 4 total, 2 distinct
            (2, "x y z w"),          # all distinct
            (3, ""),                 # no grams at all
            (4, "q r"),              # shorter than both n values
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_grams"], r["n_distinct"], round(r["dup_frac"], 6),
            r["top_count"], round(r["top_frac"], 6),
        )
        for r in repetition_metrics(docs).collect()
    }
    # doc1: 2-grams = [ab, ba, ab, ba, ab] -> top 'a b' x3 of 5
    assert got[1] == (4, 2, 0.5, 3, 0.6)
    assert got[2] == (2, 2, 0.0, 1, round(1 / 3, 6))
    assert got[3] == (0, 0, 0.0, 0, 0.0)
    assert got[4] == (0, 0, 0.0, 1, 1.0)  # one 2-gram, zero 3-grams
