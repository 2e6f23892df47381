"""Invariants for operators/graphalgo.py beyond the DuckDB hash gate:
known-graph answers and fixed-point conservation properties."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.operators.graphalgo import (
    PAGERANK_SCALE,
    pagerank_fixed,
    triangle_counts,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangles_known_graph(spark):
    # K4 minus one edge: triangles {1,2,3} and {1,2,4} → node1:2, node2:2,
    # node3:1, node4:1
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4)])
    got = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangles_ignore_direction_and_self_loops(spark):
    # same triangle expressed with mixed directions + a self loop + a dup
    e = _edges(spark, [(1, 2), (3, 2), (3, 1), (1, 1), (2, 1)])
    got = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_pagerank_cycle_is_uniform(spark):
    # 3-cycle: perfectly symmetric → every node keeps the identical rank
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    ranks = pagerank_fixed(e, iters=5).collect()
    vals = {r.rank_fp for r in ranks}
    assert len(vals) == 1
    # symmetric flow loses nothing to dangling/floor beyond tiny quanta
    assert abs(vals.pop() - PAGERANK_SCALE // 3) <= 5


def test_pagerank_sink_attracts_mass(spark):
    # star into node 9: 9's rank must dominate every spoke
    e = _edges(spark, [(1, 9), (2, 9), (3, 9), (9, 1)])
    ranks = {r.node: r.rank_fp for r in pagerank_fixed(e, iters=5).collect()}
    assert ranks[9] > ranks[1] > ranks[2] == ranks[3]


def test_pagerank_mass_bounded(spark):
    # total fixed-point mass never exceeds the initial total (dangling
    # and floor losses only shrink it)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 2), (5, 1)])
    total = (
        pagerank_fixed(e, iters=5)
        .agg(F.sum("rank_fp").alias("s"))
        .collect()[0]
        .s
    )
    assert 0 < total <= PAGERANK_SCALE


def test_personalized_pagerank_zero_outside_reachable_set(spark):
    from binaryx_graph_spark.operators.graphalgo import personalized_pagerank_fixed

    # seeds = {1}; node 5 is in a separate component → rank exactly 0;
    # seed keeps the teleport share; downstream nodes get flow
    e = _edges(spark, [(1, 2), (2, 3), (5, 6)])
    ranks = {
        r.node: r.rank_fp
        for r in personalized_pagerank_fixed(spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "src long, dst long"
        ), F.col("v") == 1, iters=4).collect()
    }
    assert ranks[5] == 0 and ranks[6] == 0
    assert ranks[1] > ranks[2] > ranks[3] > 0


def test_kcore_peel_cascades(spark):
    """k=2 peel: the triangle survives; the pendant chain dies only
    through cascading rounds (4-3 dies in round 1, then 3's degree
    drops below 2 and the next round removes it... within `rounds`)."""
    from binaryx_graph_spark.operators.graphalgo import kcore_peel

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)], "src long, dst long"
    )
    got = {r["node"]: r["degree"] for r in kcore_peel(edges, k=2, rounds=3).collect()}
    assert got == {0: 2, 1: 2, 2: 2}

    # k=1, 1 round: nothing peels (every node has degree >= 1)
    got1 = {r["node"]: r["degree"] for r in kcore_peel(edges, k=1, rounds=1).collect()}
    assert got1 == {0: 2, 1: 2, 2: 3, 3: 2, 4: 1}


def test_label_propagation_two_cliques(spark):
    from binaryx_graph_spark.operators.graphalgo import label_propagation

    # two triangles bridged by one edge: each clique converges to one
    # community (its smallest member id); the bridge doesn't merge them
    clique_a = [(1, 2), (2, 3), (1, 3)]
    clique_b = [(10, 11), (11, 12), (10, 12)]
    e = _edges(spark, clique_a + clique_b + [(3, 10)])
    got = {r.node: r.community for r in label_propagation(e, rounds=4).collect()}
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_label_propagation_deterministic(spark):
    from binaryx_graph_spark.operators.graphalgo import label_propagation

    e = _edges(spark, [(i, (i * 7) % 23) for i in range(1, 23)])
    a = sorted(map(tuple, label_propagation(e, rounds=3).collect()))
    b = sorted(map(tuple, label_propagation(e, rounds=3).collect()))
    assert a == b


def test_modularity_two_cliques_positive(spark):
    from binaryx_graph_spark.operators.graphalgo import community_modularity

    # two bridged triangles: strong community structure → Q > 0, and the
    # integer identity Σ degree_sum == 2m, Σ intra ≤ m must hold
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12), (3, 10)])
    rows = community_modularity(e, rounds=4).collect()
    m = 7
    assert sum(r.degree_sum for r in rows) == 2 * m
    assert sum(r.intra_edges for r in rows) <= m
    q = sum(r.contrib_q for r in rows) / (4 * m * m)
    assert 0.0 < q <= 1.0
