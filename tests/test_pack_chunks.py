"""Sequence packing edge cases: boundary straddle, empty docs, totals."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import pack_chunks


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_pack_boundary_straddle_and_empty(spark):
    # chunk size 4: doc1 has 3 tokens [0,3), doc2 has 3 tokens [3,6) --
    # straddles the chunk boundary at 4; doc3 empty; doc4 starts at 6
    docs = _docs(
        spark,
        [
            (1, "a b c"),
            (2, "d e f"),
            (3, ""),
            (4, "g h"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["chunk_start"], r["chunk_end"], r["n_chunks"])
        for r in pack_chunks(docs, chunk_tokens=4).collect()
    }
    assert got[1] == (3, 0, 0, 0, 1)
    assert got[2] == (3, 3, 0, 1, 2)  # straddles chunks 0 and 1
    assert got[3] == (0, 6, 1, 0, 0)  # empty doc: degenerate span, zero chunks
    assert got[4] == (2, 6, 1, 1, 1)


def test_pack_total_chunks_consistent(spark):
    docs = _docs(spark, [(i, " ".join(["t"] * 5)) for i in range(1, 21)])  # 100 tokens
    rows = pack_chunks(docs, chunk_tokens=16).collect()
    assert max(r["chunk_end"] for r in rows) == (100 - 1) // 16
    # spans tile the stream: each doc starts where the previous ended
    ordered = sorted(rows, key=lambda r: r["doc_id"])
    pos = 0
    for r in ordered:
        assert r["tok_start"] == pos
        pos += r["n_tokens"]


def test_pack_sharded_equals_global(spark):
    """The sharded two-level scan must reproduce the single-global-window
    result EXACTLY (monotone range bucketing + per-shard offsets), on a
    corpus with skewed lengths, empty docs, and non-contiguous ids."""
    rows = [
        (i * 7 + (i % 3), " ".join(["w"] * ((i * 13) % 29)))  # lengths 0..28
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    want = sorted(
        map(tuple, pack_chunks(docs, chunk_tokens=16, shards=1).collect())
    )
    for n in (4, 8, 32, 256):  # incl. shards >> docs/shard and dup bounds
        got = sorted(
            map(tuple, pack_chunks(docs, chunk_tokens=16, shards=n).collect())
        )
        assert got == want, f"shards={n}"


def test_pack_sharded_equals_global_string_ids(spark):
    """The r8 shard assignment was a numeric-only CASE chain; the
    repartitionByRange shape shards ANY orderable id — pin exact
    equality on string ids (including ids whose lexicographic order
    differs from their numeric suffix order)."""
    rows = [
        (f"doc_{(i * 37) % 200:d}_{i % 7}", " ".join(["w"] * ((i * 13) % 29)))
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    want = sorted(
        map(tuple, pack_chunks(docs, chunk_tokens=16, shards=1).collect())
    )
    for n in (4, 32, 256):
        got = sorted(
            map(tuple, pack_chunks(docs, chunk_tokens=16, shards=n).collect())
        )
        assert got == want, f"shards={n}"


def test_pack_sharded_plan_no_data_single_partition(spark):
    """The doc-row path must NOT pass through a single-partition window:
    the only SinglePartition step allowed is the per-shard-TOTALS prefix
    sum (<= shards rows). The data window is partitioned by _shard, the
    sharding is a range exchange, and there is NO per-row boundary CASE
    chain (the r8 shape grew an O(shards) expression)."""
    docs = _docs(spark, [(i, "a b c") for i in range(50)])
    df = pack_chunks(docs, chunk_tokens=8, shards=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the partitioned data window exists...
    assert "windowspecdefinition(_shard" in plan or "hashpartitioning(_shard" in plan
    # ...no boundary CASE chain on the id column anywhere in the plan
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "CASE WHEN (doc_id" not in plan and "CASE WHEN (doc_id" not in analyzed
    # ...and the global (shards=1) twin still has its single partition
    g = pack_chunks(docs, chunk_tokens=8, shards=1)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in g
