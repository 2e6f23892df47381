"""bigram_lm_surprisal pinned against an independent pure-Python
reference (same math, different execution), including the top-M cap
boundary and single-token docs."""

from __future__ import annotations

import math
import os
import re
import sys
from collections import Counter

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import (
    SURPRISAL_SCALE,
    bigram_lm_surprisal,
)


def _py_reference(texts: dict[int, str], top_m: int) -> dict[int, tuple[int, int]]:
    toks = {i: [t for t in re.split(r"\s+", s.lower()) if t] for i, s in texts.items()}
    uni = Counter(t for ts in toks.values() for t in ts)
    n = sum(uni.values())
    bi = Counter(
        (ts[i], ts[i + 1]) for ts in toks.values() for i in range(len(ts) - 1)
    )
    top = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:top_m]
    scale = float(SURPRISAL_SCALE)
    q_bi = {
        (p, c): int(
            math.floor(
                -math.log2((0.9 * cnt) / uni[p] + (0.1 * uni[c]) / n) * scale + 0.5
            )
        )
        for (p, c), cnt in top
    }
    q_uni = {
        t: int(math.floor(-math.log2((0.1 * c) / n) * scale + 0.5))
        for t, c in uni.items()
    }
    out = {}
    for i, ts in toks.items():
        qs = [
            q_bi.get((ts[j - 1], ts[j]), q_uni[ts[j]]) for j in range(1, len(ts))
        ]
        if qs:
            out[i] = (len(qs), sum(qs))
    return out


@pytest.mark.parametrize("top_m", [1, 3, 10**6])
def test_bigram_lm_matches_python_reference(spark, top_m):
    texts = {
        1: "the cat sat on the mat",
        2: "the cat ate the cat food",
        3: "dog",                      # single token: no scored positions
        4: "the the the the",          # repeated-token runs
        5: "completely novel tokens here",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {
        r.doc_id: (r.n_scored, r.total_q)
        for r in bigram_lm_surprisal(docs, top_m=top_m).collect()
    }
    assert got == _py_reference(texts, top_m)
