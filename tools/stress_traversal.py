"""Traversal stress probe (SCALE.md): path enumeration growth vs depth.

Two measured regimes:

1. **10× scaled corpus** (plans/corpus_project.py at sf0.1, replicated
   10× with distinct binary hashes): the ETL-shaped call graph — per-
   binary chains — enumerated from every chain head. Growth should be
   LINEAR in depth (out-degree 1), proving the corpus shape itself
   cannot explode and the cost is proportional to rows touched.

2. **Dense derived graph** (plans/graph_project.derived_edges at sf0.1,
   mean out-degree ~60): the exponential regime. Measured unscoped vs
   with the per-binary ``members`` scope (the reference's own
   mitigation: ALL(n IN nodes(path)) restricted to one binary's
   functions, call_path_analyzer.rs:34) — the scope bounds the frontier
   to the member subgraph.

Usage: python tools/stress_traversal.py [sf_dir]
Prints a markdown table per regime for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.operators.ingest import build_graph_tables  # noqa: E402
from binaryx_graph_spark.operators.traverse import enumerate_paths  # noqa: E402
from binaryx_graph_spark.plans.corpus_project import scaled_analysis_docs  # noqa: E402
from binaryx_graph_spark.plans.graph_project import as_call_tables, derived_edges  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402

REPLICAS = 10


def corpus_regime(spark, sf_dir: str, depths=(2, 4, 6, 8)) -> None:
    docs = scaled_analysis_docs(spark, sf_dir)
    # 10×: distinct binary hash per replica (same shape as the dedup
    # stress probe) — function uids get the replica prefix through the
    # hash, so components stay disjoint
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))
    docs10 = (
        docs.crossJoin(reps)
        .withColumn(
            "binary_info",
            F.col("binary_info").withField(
                "hashes",
                F.map_from_arrays(
                    F.array(F.lit("sha256")),
                    F.array(
                        F.concat(
                            F.element_at(F.col("binary_info.hashes"), "sha256"),
                            F.lit(":r"),
                            F.col("_rep"),
                        )
                    ),
                ),
            ),
        )
        .drop("_rep")
    )
    t = {k: v.localCheckpoint(eager=True) for k, v in build_graph_tables(docs10).items()}
    calls, funcs = t["calls"], t["functions"]
    n_fn, n_edge = funcs.count(), calls.count()
    heads = funcs.join(
        calls.select(F.col("dst_uid").alias("uid")), "uid", "left_anti"
    ).select("uid")
    n_heads = heads.count()
    print(f"\n### corpus 10× regime: {n_fn} functions, {n_edge} edges, {n_heads} chain heads\n")
    print("| depth | paths | wall |")
    print("|---|---|---|")
    for d in depths:
        t0 = time.time()
        n = enumerate_paths(calls, funcs, heads, max_depth=d).count()
        print(f"| {d} | {n} | {time.time() - t0:.1f}s |")


def dense_regime(spark, sf_dir: str, depths=(1, 2, 3, 4, 5), unscoped_cap=3) -> None:
    calls, funcs = as_call_tables(derived_edges(spark, sf_dir))
    calls = calls.localCheckpoint(eager=True)
    funcs = funcs.localCheckpoint(eager=True)
    seeds = funcs.filter(F.col("uid").cast("long") % 20 == 0).select("uid")
    # per-binary scope analog: a 100-node member subgraph (1/5 of nodes)
    members = funcs.filter(F.col("uid").cast("long") < 100).select("uid")
    n_nodes, n_edges = funcs.count(), calls.count()
    print(f"\n### dense regime: {n_nodes} nodes, {n_edges} edges, {seeds.count()} seeds\n")
    print("| depth | paths (unscoped) | wall | paths (member-scoped) | wall |")
    print("|---|---|---|---|---|")
    for d in depths:
        if d <= unscoped_cap:
            t0 = time.time()
            nu = enumerate_paths(calls, funcs, seeds, max_depth=d).count()
            unscoped = f"{nu} | {time.time() - t0:.1f}s"
        else:
            # ~45^d paths — the explosion the scope exists to prevent;
            # measuring it would just fill executor memory with arrays
            unscoped = "— (growth ≈ ×45/level) | —"
        t0 = time.time()
        ns = enumerate_paths(calls, funcs, seeds, max_depth=d, members=members).count()
        ts = time.time() - t0
        print(f"| {d} | {unscoped} | {ns} | {ts:.1f}s |")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-traversal")
    corpus_regime(spark, sf_dir)
    dense_regime(spark, sf_dir)
    spark.stop()


if __name__ == "__main__":
    main()
