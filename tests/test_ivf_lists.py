"""Persisted IVF inverted lists: partition pruning is real, results are
identical to the in-memory probe path.

The SCALE.md claim "at scale the inverted lists are
repartition(centroid_id) parquet so a probe prunes partitions" made
executable: build lists with ``build_ivf_lists``, probe with
``cosine_topk_ivf_lists``, and assert (a) row-for-row equality with
``cosine_topk_ivf`` for the same trained codebook, (b) the probe scan
carries the centroid filter as ``PartitionFilters`` (directory prune),
not a post-scan filter.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.similarity import (
    build_ivf_lists,
    cosine_topk_ivf,
    cosine_topk_ivf_lists,
    kmeans_codebook,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
QUERY_ID = 7


def test_ivf_lists_match_in_memory_probe(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    book = kmeans_codebook(emb, n_centroids=8, iters=2)
    path = str(tmp_path / "ivf_lists")
    build_ivf_lists(emb, book, path)

    qv = [float(x) for x in emb.filter(emb.vec_id == QUERY_ID).head()["embedding"]]
    got = cosine_topk_ivf_lists(
        spark, path, book, qv, k=10, n_probe=2, exclude_id=QUERY_ID
    )
    want = cosine_topk_ivf(
        emb, QUERY_ID, k=10, n_centroids=8, n_probe=2, kmeans_iters=2
    )
    got_rows = [(r["vec_id"], r["cos_sim"]) for r in got.collect()]
    want_rows = [(r["vec_id"], r["cos_sim"]) for r in want.collect()]
    assert got_rows == want_rows and len(got_rows) == 10


def test_ivf_lists_probe_prunes_partitions(spark, tmp_path):
    emb = load_table(spark, SF, "embeddings")
    book = kmeans_codebook(emb, n_centroids=8, iters=2)
    path = str(tmp_path / "ivf_lists")
    build_ivf_lists(emb, book, path)

    qv = [float(x) for x in emb.filter(emb.vec_id == QUERY_ID).head()["embedding"]]
    df = cosine_topk_ivf_lists(spark, path, book, qv, k=10, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # centroid_id is a partition column: the probe must appear in
    # PartitionFilters (directory pruning), and the lists dir must
    # actually be hive-partitioned
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:2000]
    parts = [p for p in os.listdir(path) if p.startswith("centroid_id=")]
    assert len(parts) == 8
