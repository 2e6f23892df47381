"""Planning-statistics growth audit (SCALE.md addenda 32/33): measure
the BIT LENGTH of each iterative operator's result-plan sizeInBytes at
two round/depth settings.  LogicalRDD carries origin-plan stats across
localCheckpoint; loops whose next state joins SEVERAL views of the
previous state compound them multiplicatively until Catalyst's
BigInteger size arithmetic dominates planning.  ADDITIVE growth
(roughly +constant bits per level) is safe at any depth; anything
whose bits MULTIPLY when rounds double is a regression — fix with
plans/lineage.checkpoint_cut (see scc_fwbw, connected_components).

Usage: python tools/stress_stats_bits.py
Prints one line per (operator, setting); exits 1 on a multiplicative
regression (doubling rounds more than ~quadruples the bits).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.session import get_spark  # noqa: E402


def bits(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().bit_length()


def main() -> int:
    spark = get_spark("stats-bits-audit")
    e = (
        spark.range(60)
        .select((F.col("id") % 12).alias("src"), ((F.col("id") * 7 + 1) % 12).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pairs = e.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))

    from binaryx_graph_spark.operators import graphalgo as G
    from binaryx_graph_spark.operators.dedup import connected_components

    seeds = e.select(F.col("src").alias("v")).distinct().limit(2)
    cases = [
        ("pagerank", lambda k: G.pagerank_fixed(e, iters=k), 4),
        ("hits", lambda k: G.hits_fixed(e, iters=k), 3),
        ("kcore", lambda k: G.kcore_peel(e, k=2, rounds=k), 4),
        ("lpa", lambda k: G.label_propagation(e, rounds=k), 4),
        ("bellman_ford", lambda k: G.bellman_ford(e.withColumn("w", F.lit(1)), seeds, iters=k), 4),
    ]
    bad = False
    for name, fn, base in cases:
        b1, b2 = bits(fn(base)), bits(fn(base * 2))
        regime = "additive" if b2 <= 4 * max(b1, 16) else "MULTIPLICATIVE"
        bad |= regime != "additive"
        print(f"{name}: rounds {base}->{base*2} bits {b1}->{b2} [{regime}]")
    # the two historically-multiplicative loops, now stats-cut: bits
    # must stay at the defaultSizeInBytes floor (<= 64)
    for name, df in [
        ("scc_fwbw", G.scc_fwbw(e)),
        ("connected_components(dist)", connected_components(pairs, local_max_edges=0)),
    ]:
        b = bits(df)
        # result is a union of per-round frames: bits grow with the SUM
        # of (cut) child sizes — linear in round count, never compounded
        regime = "bounded" if b <= 512 else "MULTIPLICATIVE"
        bad |= regime != "bounded"
        print(f"{name}: result bits {b} [{regime}]")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
