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


def test_min_count_floor_bounds_driver_table(spark):
    """SCALE.md ceiling #6 closure: an adversarial linear-vocabulary
    corpus (every token a fresh hex string) must NOT produce a
    vocabulary-sized driver table when min_count > 1 — the tail pools
    into one OOV bucket and every position still scores."""
    import hashlib

    from binaryx_graph_spark.operators.textstats import _BIGRAM_CACHE

    n_docs, toks_per_doc = 60, 8
    texts = {
        i: " ".join(
            "common" if j == 0 else
            hashlib.sha256(f"{i}:{j}".encode()).hexdigest()[:12]
            for j in range(toks_per_doc)
        )
        for i in range(n_docs)
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    key = "lin_vocab_stress"
    out = bigram_lm_surprisal(
        docs, top_m=1000, min_count=2, corpus_key=key
    ).collect()
    bi_rows, uni_rows, q_oov = _BIGRAM_CACHE[("lin_vocab_stress", "text", 1000, 2)]
    # vocab is ~n_docs*toks_per_doc fresh types + 1 common; only tokens
    # with count >= 2 may reach the driver
    assert len(uni_rows) == 1 and uni_rows[0][0] == "common"
    assert q_oov is not None
    # bigrams touching OOV are excluded -> no scorable bigram repeats
    assert all(p == "common" or c == "common" for p, c, _q in bi_rows)
    # every doc still fully scored through the OOV bucket
    got = {r.doc_id: r.n_scored for r in out}
    assert got == {i: toks_per_doc - 1 for i in range(n_docs)}


def test_min_count_floor_inactive_when_all_tokens_frequent(spark):
    """min_count=2 must be bit-identical to min_count=1 on a corpus
    where every token already appears >= 2 times (empty tail)."""
    texts = {
        1: "the cat sat on the mat",
        2: "the cat ate the mat on sat",
        3: "sat on ate cat",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    base = {
        (r.doc_id): (r.n_scored, r.total_q)
        for r in bigram_lm_surprisal(docs, top_m=50).collect()
    }
    floored = {
        (r.doc_id): (r.n_scored, r.total_q)
        for r in bigram_lm_surprisal(docs, top_m=50, min_count=2).collect()
    }
    assert base == floored
