"""bm25_topk pinned against an independent pure-Python reference (same
math, different execution): exact score_fp equality, ranking order,
absent-term and no-match-doc edge cases."""

from __future__ import annotations

import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import SURPRISAL_SCALE, bm25_topk


def _py_bm25(texts: dict[int, str], query: list[str], k1=1.2, b=0.75):
    toks = {i: [t for t in re.split(r"\s+", s.lower()) if t] for i, s in texts.items()}
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks.values()) / n
    scale = float(SURPRISAL_SCALE)
    out: dict[int, int] = {}
    for t in sorted(set(query)):
        df = sum(1 for ts in toks.values() if t in ts)
        if not df:
            continue
        idf_fp = int(math.floor(math.log(((n - df) + 0.5) / (df + 0.5) + 1.0) * scale + 0.5))
        for i, ts in toks.items():
            tf = ts.count(t)
            if not tf:
                continue
            dl = len(ts)
            c = int(
                math.floor(
                    idf_fp * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + (b * dl) / avgdl)))
                    + 0.5
                )
            )
            out[i] = out.get(i, 0) + c
    return out


def test_bm25_matches_python_reference(spark):
    texts = {
        1: "spark shuffle join spark spark",
        2: "join window join",
        3: "completely unrelated words here now",
        4: "spark",
        5: "window window window window spark join",
    }
    # 'ghost' never occurs — absent-term arm
    query = ["spark", "join", "ghost"]
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    got = {r.doc_id: r.score_fp for r in bm25_topk(docs, query, k=10).collect()}
    want = _py_bm25(texts, query)
    assert got == want
    assert 3 not in got  # no query term -> no row
    # ranking by score desc is what the operator promises
    ranked = [r.doc_id for r in bm25_topk(docs, query, k=3).collect()]
    assert ranked == sorted(want, key=lambda i: (-want[i], i))[:3]


def test_bm25_no_term_in_corpus(spark):
    docs = spark.createDataFrame([(1, "alpha beta")], "doc_id int, text string")
    assert bm25_topk(docs, ["ghost"], k=5).count() == 0
