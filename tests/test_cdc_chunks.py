"""Content-defined chunking: boundary determinism, insertion
resynchronization (the property fixed windows lack), duplicate mining."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.dedup import cdc_chunks, cdc_duplicate_chunks


def _py_chunks(text: str) -> list[str]:
    toks = text.lower().split()
    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if hashlib.md5(t.encode()).hexdigest()[-1] == "0":
            chunks.append(" ".join(cur))
            cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_cdc_matches_python_reference(spark):
    base = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame([(1, base)], "doc_id int, text string")
    got = [
        r.chunk_text
        for r in sorted(cdc_chunks(docs, "doc_id", "text").collect(), key=lambda r: r.chunk_id)
    ]
    assert got == _py_chunks(base)
    assert len(got) > 3  # the boundary rule actually fires on this vocab


def test_cdc_resynchronizes_after_insertion(spark):
    """Insert ONE token at the front: all chunks after the first
    boundary are identical — the content-defined property.  A
    fixed-size window chunker shares ZERO windows here."""
    base = " ".join(f"tok{i}" for i in range(200))
    shifted = "inserted " + base
    docs = spark.createDataFrame(
        [(1, base), (2, shifted)], "doc_id int, text string"
    )
    out = cdc_chunks(docs, "doc_id", "text").collect()
    c1 = {r.chunk_md5 for r in out if r.doc_id == 1}
    c2 = {r.chunk_md5 for r in out if r.doc_id == 2}
    shared = c1 & c2
    # everything beyond the perturbed first chunk is shared
    assert len(shared) >= len(c1) - 1 and len(shared) > 3
    # contrast: fixed windows of the same mean size share nothing
    py1, py2 = _py_chunks(base), _py_chunks(shifted)
    fixed1 = {" ".join(base.split()[i : i + 16]) for i in range(0, 200, 16)}
    fixed2 = {" ".join(shifted.split()[i : i + 16]) for i in range(0, 201, 16)}
    assert not (fixed1 & fixed2)
    # python reference agrees: its shared-chunk count equals Spark's
    assert len(set(py1) & set(py2)) == len(shared)


def test_cdc_duplicate_mining(spark):
    boiler = " ".join(f"tok{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, boiler + " uniqa uniqb"), (2, boiler + " uniqc"), (3, "totally different words")],
        "doc_id int, text string",
    )
    dups = cdc_duplicate_chunks(docs, "doc_id", "text", k=10).collect()
    assert dups and all(r.n_occurrences >= 2 for r in dups)
    assert any(r.n_docs == 2 for r in dups)


def test_streaming_cdc_equals_global_pass(spark, tmp_path):
    """The streaming chunk-stat index after draining all micro-batches
    equals the global cdc_duplicate_chunks pass (stats dict pins batch
    count and chunk-cardinality state)."""
    from binaryx_graph_spark.streaming.dedup_stream import streaming_cdc_dedup

    sf_dir = "/root/testdata/sf0.001"
    stats: dict = {}
    got = {
        (r.chunk_md5, r.n_tokens): (r.n_occurrences, r.n_docs)
        for r in streaming_cdc_dedup(spark, sf_dir, k=1000, arrival_batches=4, stats=stats).collect()
    }
    from binaryx_graph_spark.model import load_table

    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r.chunk_md5, r.n_tokens): (r.n_occurrences, r.n_docs)
        for r in cdc_duplicate_chunks(docs, "doc_id", "text", k=1000).collect()
    }
    assert got == want
    assert stats["n_batches"] == 4
    assert stats["index_size"] > 0
