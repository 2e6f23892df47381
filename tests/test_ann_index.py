"""Incremental IVF index maintenance (operators/ann_index.py).

The invariant: after ANY interleaving of insert/update/delete commits
on the source table, `ivf_index_refresh` (reading only the change
feed) leaves assignments IDENTICAL to a full rebuild against the live
table — and the probe over the maintained index returns the same rows
as a probe over a fresh one.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.operators.ann_index import (
    cosine_topk_ivf_index,
    ivf_index_assignments,
    ivf_index_refresh,
)
from binaryx_graph_spark.operators.similarity import ivf_assign, kmeans_codebook
from binaryx_graph_spark.sources.warehouse import Warehouse


def _vectors(spark, n=300, dim=8, seed=7):
    rnd = random.Random(seed)
    rows = [
        (i, [rnd.uniform(-1, 1) for _ in range(dim)], i % 3)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.clear()
    w.merge_batch_incremental({"vectors": _vectors(spark)}, n_buckets=8)
    return w


def _pairs(df):
    return sorted((r["vec_id"], r["centroid_id"]) for r in df.collect())


def _rebuild_pairs(spark, wh, codebook):
    live = wh.read("vectors")
    return sorted(
        (r["vec_id"], r["centroid_id"])
        for r in ivf_assign(live, codebook).select("vec_id", "centroid_id").collect()
    )


def test_full_build_then_noop(spark, wh):
    cb = kmeans_codebook(wh.read("vectors"), n_centroids=4, iters=1)
    d = ivf_index_refresh(wh, "vectors", "c1", cb)
    assert d["mode"] == "full" and d["rows_assigned"] == 300
    assert _pairs(ivf_index_assignments(wh, "c1")) == _rebuild_pairs(spark, wh, cb)
    d2 = ivf_index_refresh(wh, "vectors", "c1", cb)
    assert d2["mode"] == "noop"


def test_incremental_equals_rebuild_after_mixed_commits(spark, wh):
    cb = kmeans_codebook(wh.read("vectors"), n_centroids=4, iters=1)
    ivf_index_refresh(wh, "vectors", "c1", cb)
    # commit 1: delete a slice (DV lane)
    wh.delete_where_dv("vectors", [("vec_id", "between", (10, 29))])
    # commit 2: move some vectors (update images flow through the feed)
    wh.update_where_dv(
        "vectors",
        [("vec_id", "between", (50, 59))],
        {"embedding": F.reverse(F.col("embedding"))},
    )
    # commit 3: fresh inserts
    wh.merge_batch_incremental(
        {"vectors": _vectors(spark, n=30, seed=99).withColumn(
            "vec_id", F.col("vec_id") + 1000
        )},
        batch_seq=2,
    )
    d = ivf_index_refresh(wh, "vectors", "c1", cb)
    assert d["mode"] == "incremental"
    assert d["rows_removed"] == 20
    assert d["rows_assigned"] == 40  # 10 updated images + 30 inserts
    assert _pairs(ivf_index_assignments(wh, "c1")) == _rebuild_pairs(spark, wh, cb)
    # the index never kept a deleted id
    assert (
        ivf_index_assignments(wh, "c1")
        .filter(F.col("vec_id").between(10, 29))
        .count()
        == 0
    )


def test_probe_over_maintained_index_is_exact_with_all_lists(spark, wh):
    cb = kmeans_codebook(wh.read("vectors"), n_centroids=4, iters=1)
    ivf_index_refresh(wh, "vectors", "c1", cb)
    wh.delete_where_dv("vectors", [("vec_id", "between", (0, 4))])
    wh.merge_batch_incremental(
        {"vectors": _vectors(spark, n=10, seed=41).withColumn(
            "vec_id", F.col("vec_id") + 2000
        )},
        batch_seq=2,
    )
    ivf_index_refresh(wh, "vectors", "c1", cb)
    q = wh.read("vectors").filter(F.col("vec_id") == 7).head()["embedding"]
    got = cosine_topk_ivf_index(
        wh, "c1", cb, q, k=5, n_probe=len(cb), exclude_id=7
    )
    # all-lists probe ≡ brute force over the live table
    from binaryx_graph_spark.operators.similarity import cosine_topk

    want = cosine_topk(wh.read("vectors"), 7, k=5)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]


def test_codebook_change_forces_full_rebuild(spark, wh):
    cb1 = kmeans_codebook(wh.read("vectors"), n_centroids=4, iters=1)
    ivf_index_refresh(wh, "vectors", "c1", cb1)
    cb2 = kmeans_codebook(wh.read("vectors"), n_centroids=8, iters=1)
    d = ivf_index_refresh(wh, "vectors", "c1", cb2)
    assert d["mode"] == "full"
    assert _pairs(ivf_index_assignments(wh, "c1")) == _rebuild_pairs(spark, wh, cb2)
    # no assignments from the old codebook survive
    maxc = ivf_index_assignments(wh, "c1").agg(
        F.max("centroid_id").alias("m")
    ).head()["m"]
    assert maxc is not None


def test_two_corpora_are_isolated(spark, wh, tmp_path):
    cb = kmeans_codebook(wh.read("vectors"), n_centroids=4, iters=1)
    ivf_index_refresh(wh, "vectors", "c1", cb)
    ivf_index_refresh(wh, "vectors", "c2", cb)
    wh.delete_where_dv("vectors", [("vec_id", "=", 3)])
    ivf_index_refresh(wh, "vectors", "c1", cb)  # only c1 refreshed
    a = ivf_index_assignments(wh, "c1")
    b = ivf_index_assignments(wh, "c2")
    assert a.filter(F.col("vec_id") == 3).count() == 0
    assert b.filter(F.col("vec_id") == 3).count() == 1  # c2 is stale, intact


def test_clustered_index_scan_prunes(spark, wh):
    cb = kmeans_codebook(wh.read("vectors"), n_centroids=4, iters=1)
    ivf_index_refresh(wh, "vectors", "c1", cb)
    wh.optimize(
        target_bytes=4096, cluster_by={"_ivf_assignments": ["centroid_id"]}
    )
    got, diag = wh.scan(
        "_ivf_assignments",
        [("corpus", "=", "c1"), ("centroid_id", "in", [0])],
        with_diagnostics=True,
    )
    assert got.count() > 0
    assert diag["files_read"] < diag["files_total"], (
        f"cluster-by-centroid should let the probe prune files: {diag}"
    )


def test_lit_vec_bit_exact_and_nonfinite(spark):
    """_lit_vec round-trips finite doubles bit-exactly and survives
    non-finite elements (r13 ADVICE: repr(nan) parsed as a column ref)."""
    import math
    import struct

    from binaryx_graph_spark.operators.similarity import _lit_vec

    vals = [0.1, -2.5e-308, 3.141592653589793, 1e308, -0.0]
    got = spark.range(1).select(_lit_vec(vals).alias("v")).collect()[0]["v"]
    assert [struct.pack(">d", g) for g in got] == [
        struct.pack(">d", v) for v in vals
    ]
    nf = [float("nan"), float("inf"), float("-inf"), 1.5]
    got = spark.range(1).select(_lit_vec(nf).alias("v")).collect()[0]["v"]
    assert math.isnan(got[0])
    assert got[1] == float("inf") and got[2] == float("-inf") and got[3] == 1.5
