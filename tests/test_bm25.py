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


def test_chunk_overlap_coverage_and_overlap(spark):
    """Every token covered, consecutive chunks overlap by size-stride,
    short doc -> exactly one chunk, empty doc -> no rows."""
    from binaryx_graph_spark.operators.textstats import chunk_overlap

    texts = {
        1: " ".join(f"t{i}" for i in range(10)),  # 10 tokens
        2: "a b c",                                # short: one chunk
        3: "",                                     # empty: no rows
        4: " ".join(f"w{i}" for i in range(9)),    # exactly size+stride boundary
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id int, text string")
    rows = chunk_overlap(docs, size=4, stride=3).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    assert [r.chunk_text for r in by_doc[2]] == ["a b c"]
    # doc 1: starts 1,4,7,10 -> ceil((10-4)/3)=2 -> k=0,1,2 -> starts 1,4,7
    chunks = [r.chunk_text.split() for r in by_doc[1]]
    assert chunks[0] == ["t0", "t1", "t2", "t3"]
    assert chunks[1] == ["t3", "t4", "t5", "t6"]
    assert chunks[2] == ["t6", "t7", "t8", "t9"]
    covered = {t for c in chunks for t in c}
    assert covered == {f"t{i}" for i in range(10)}
    # overlap = size - stride = 1 token between consecutive chunks
    assert chunks[0][-1] == chunks[1][0] and chunks[1][-1] == chunks[2][0]


def test_frequent_ngrams_counts(spark):
    from binaryx_graph_spark.operators.textstats import frequent_ngrams

    docs = spark.createDataFrame(
        [(1, "the quick fox the quick fox"), (2, "the quick fox jumps")],
        "doc_id int, text string",
    )
    rows = {r.ngram: (r.n_occurrences, r.n_docs) for r in frequent_ngrams(docs, n=3, k=5).collect()}
    assert rows["the quick fox"] == (3, 2)
    assert rows["quick fox the"] == (1, 1)


def test_boilerplate_share(spark):
    from binaryx_graph_spark.operators.textstats import boilerplate_share

    boiler = "the quick fox " * 10  # one dominant trigram family
    docs = spark.createDataFrame(
        [(1, boiler), (2, boiler + " unique tail words here"),
         (3, "completely fresh text with no repeats at all"), (4, "ab")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in boilerplate_share(docs, n=3, top_k=5).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[1].boiler_share == 1.0                  # pure boilerplate
    assert 0.0 < rows[2].boiler_share < 1.0             # mixed
    assert rows[4].n_ngrams == 0 and rows[4].boiler_share == 0.0  # < n tokens
