"""Skewed-graph stress for the iterative family (r6 verdict #4).

Real call graphs are power-law — imports like ``memcpy`` have enormous
in-degree — while the derived gate graphs are near-uniform.  This probe
builds a HUB-HEAVY variant of the 10×-replicated derived graph (one
node carrying ~10% of ALL edges, half inbound / half outbound) and
measures the three iterative operators on uniform vs hub graphs of the
SAME edge cardinality, so any wall-time delta is the skew itself, not
data volume:

- pagerank_fixed        (join on src per round, agg on dst)
- connected_components  (distributed pointer-jumping, min-label)
- scc_fwbw              (pivot forward/backward closures)

For each (graph, operator): wall seconds, rounds (where observable),
and a result sanity check (hub rank must dominate; hub graph must
collapse into one giant CC containing the hub).  AQE is on
(session.py), so its skew-split handles the shuffle-join side; the probe
exists to DETECT any straggler AQE cannot see — if hub/uniform wall
ratio stays near 1, no salting is needed; a large ratio names the
operator to salt (functions/skew.py primitives are ready).

Usage: python tools/stress_skew.py [sf_dir]   (default sf0.1)
Prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.operators.dedup import connected_components  # noqa: E402
from binaryx_graph_spark.operators.graphalgo import pagerank_fixed, scc_fwbw  # noqa: E402
from binaryx_graph_spark.plans.graph_project import derived_edges  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402

REPLICAS = 10
OFFSET = 1_000_000
HUB = 999_999_999  # a node id outside every replica's range


def _replicate(spark, edges, n: int):
    reps = spark.range(n).select((F.col("id") * OFFSET).alias("off"))
    return (
        edges.crossJoin(F.broadcast(reps))
        .select(
            (F.col("src") + F.col("off")).alias("src"),
            (F.col("dst") + F.col("off")).alias("dst"),
        )
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress-skew")
    base = _replicate(spark, derived_edges(spark, sf_dir), REPLICAS)
    n_base = base.count()

    # Hub edges: ~10% of the TOTAL graph → n_hub = n_base / 9 gives
    # n_hub / (n_base + n_hub) = 10%.  Half point AT the hub (the
    # memcpy shape: everyone calls it), half FROM it.
    n_hub = n_base // 9
    k = REPLICAS * OFFSET
    hub_in = spark.range(n_hub // 2).select(
        (F.col("id") * 7919 % k).alias("src"), F.lit(HUB).alias("dst")
    )
    hub_out = spark.range(n_hub - n_hub // 2).select(
        F.lit(HUB).alias("src"), (F.col("id") * 104729 % k).alias("dst")
    )
    # Uniform control of the SAME cardinality: the hub edges re-pointed
    # at spread-out endpoints, so both graphs have n_base + n_hub edges.
    # control endpoints stay INSIDE the existing node-id space so both
    # graphs share one node set (hub adds exactly one node) — otherwise
    # the control grows extra nodes and the comparison confounds node
    # count with skew
    pad_in = spark.range(n_hub // 2).select(
        (F.col("id") * 7919 % k).alias("src"), (F.col("id") * 31 % k).alias("dst")
    )
    pad_out = spark.range(n_hub - n_hub // 2).select(
        (F.col("id") * 31 % k).alias("src"), (F.col("id") * 104729 % k).alias("dst")
    )
    hub_g = base.unionByName(hub_in).unionByName(hub_out).localCheckpoint(eager=True)
    uni_g = base.unionByName(pad_in).unionByName(pad_out).localCheckpoint(eager=True)
    print(
        f"# edges: uniform {uni_g.count():,} / hub {hub_g.count():,} "
        f"(hub degree ≈ {n_hub:,} = {100 * n_hub / (n_base + n_hub):.1f}%)",
        file=sys.stderr,
    )

    def wall(fn, g):
        t0 = time.time()
        out = fn(g)
        n = out.count()
        return round(time.time() - t0, 2), n, out

    rows = []
    for name, fn in [
        ("pagerank_fixed(iters=5)", lambda g: pagerank_fixed(g, iters=5)),
        (
            "connected_components(distributed)",
            lambda g: connected_components(
                g.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")),
                local_max_edges=0,
            ),
        ),
        ("scc_fwbw", lambda g: scc_fwbw(g)),
    ]:
        tu, nu, _ = wall(fn, uni_g)
        th, nh, out_h = wall(fn, hub_g)
        sanity = ""
        if name.startswith("pagerank"):
            top = out_h.orderBy(F.desc("rank_fp")).select("node").first()[0]
            sanity = f"hub top-ranked: {int(top) == HUB}"
        elif name.startswith("connected"):
            hub_cluster = out_h.filter(F.col("doc_id") == HUB).first()["cluster_id"]
            csize = out_h.filter(F.col("cluster_id") == hub_cluster).count()
            sanity = f"hub CC size {csize:,}"
        rows.append((name, tu, nu, th, nh, round(th / tu, 2), sanity))

    print("\n| operator | uniform s | rows | hub s | rows | hub/uniform | sanity |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print("| " + " | ".join(str(x) for x in r) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
