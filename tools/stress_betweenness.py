"""Betweenness 10× scale probe (SCALE.md addendum): measure the
forward/backward phase wall and the (source, v) frontier cardinality
per level at depth 3 and 4, on the sf0.1 derived graph and a 10×
disjoint replication (the A10/A13 pattern: node ids offset per replica,
so components never merge and per-replica structure is identical).

Three regimes isolate the two scale axes:

- 1×, 8 sources   — the registered query's shape
- 10×, 8 sources  — DATA-size scaling at fixed work: the 8 global
  top-degree sources land in few replicas, so the frontier stays
  ~constant while every edge-join scans a 10× table
- 10×, 80 sources — WORK scaling: 10× sources on 10× data; the
  (source, v) pair frames grow ~10×, the per-level join/agg count does
  not (all sources advance together — never a per-source loop)

Usage: python tools/stress_betweenness.py [sf_dir]
Prints markdown tables for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.operators.graphalgo import betweenness_sampled  # noqa: E402
from binaryx_graph_spark.plans.graph_project import derived_edges  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402

REPLICAS = 10


def _frontier_counts(edges, n_sources: int, max_depth: int) -> list[int]:
    """Replicate ONLY the forward BFS (same joins as the operator) and
    count (source, v) pairs per level."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    sources = (
        deg.orderBy(F.desc("_d"), "src").limit(n_sources)
        .select(F.col("src").alias("s")).localCheckpoint(eager=True)
    )
    level = sources.select(
        "s", F.col("s").alias("v"), F.lit(1).cast("long").alias("sigma")
    )
    visited = level.select("s", "v").localCheckpoint(eager=True)
    counts = [level.count()]
    for _d in range(1, max_depth + 1):
        level = (
            level.join(edges, level.v == edges.src)
            .groupBy("s", F.col("dst").alias("v2"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("v2", "v")
            .join(visited, ["s", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        counts.append(level.count())
        visited = visited.unionByName(level.select("s", "v")).localCheckpoint(eager=True)
    return counts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress_betweenness")
    e1 = (
        derived_edges(spark, sf_dir)
        .select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    off = int(
        e1.agg(F.max(F.greatest("src", "dst")).alias("m")).first()["m"]
    ) + 1
    e10 = e1
    for r in range(1, REPLICAS):
        e10 = e10.unionByName(
            e1.select(
                (F.col("src") + r * off).alias("src"),
                (F.col("dst") + r * off).alias("dst"),
            )
        )
    e10 = e10.localCheckpoint(eager=True)
    print(f"# edges: 1x={e1.count()}, 10x={e10.count()}, id offset={off}")

    print("\n| regime | depth | wall (s, warm) | result rows |")
    print("|---|---|---|---|")
    for tag, e, ns in (("1x-8src", e1, 8), ("10x-8src", e10, 8), ("10x-80src", e10, 80)):
        for depth in (3, 4):
            walls = []
            rows = 0
            for _ in range(2):  # warm + measured
                t0 = time.time()
                rows = betweenness_sampled(e, n_sources=ns, max_depth=depth).count()
                walls.append(time.time() - t0)
            print(f"| {tag} | {depth} | {min(walls):.2f} | {rows} |")

    print("\n| regime | frontier (source,v) pairs per level 0..4 |")
    print("|---|---|")
    for tag, e, ns in (("1x-8src", e1, 8), ("10x-8src", e10, 8), ("10x-80src", e10, 80)):
        counts = _frontier_counts(e, ns, 4)
        print(f"| {tag} | {counts} |")
    spark.stop()


if __name__ == "__main__":
    main()
