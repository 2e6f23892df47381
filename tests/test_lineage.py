"""checkpoint_cut (plans/lineage.py): the stats-compounding regression.

localCheckpoint's LogicalRDD carries origin-plan size statistics; loops
whose next state joins several copies of the previous state compound
them multiplicatively until Catalyst's BigInteger size arithmetic
dominates planning (SCALE.md addendum 32).  These tests pin (a) the
helper actually resets stats, (b) values survive the rebuild untouched,
(c) the distributed CC loop — the worst measured offender (stats bits
DOUBLED per round) — now converges on a long-diameter graph that
previously planning-stalled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from binaryx_graph_spark.plans.lineage import checkpoint_cut


def _bits(df) -> int:
    return df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().bit_length()


def test_checkpoint_cut_resets_stats_and_preserves_rows(spark):
    base = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    # stack a few row-preserving self-joins (unique key) so the origin
    # stats are visibly compounded without multiplying rows
    df = base
    for _ in range(3):
        df = df.join(df.withColumnRenamed("v", "v2"), "k").select("k", "v")
    assert _bits(df) > 64  # compounded origin stats
    cut = checkpoint_cut(df)
    assert _bits(cut) <= 64  # reset to defaultSizeInBytes
    assert sorted(map(tuple, cut.collect())) == sorted(map(tuple, df.collect()))


def test_iterated_cut_stays_bounded(spark):
    # the fwbw/CC shape: state(t) = join of three views of state(t-1)
    state = checkpoint_cut(
        spark.range(20).select(F.col("id").alias("k"), F.col("id").alias("v"))
    )
    for _ in range(6):
        a = state.select(F.col("k"), F.col("v").alias("a"))
        b = state.select(F.col("k"), F.col("v").alias("b"))
        state = checkpoint_cut(
            state.join(a, "k").join(b, "k").select("k", F.least("v", "a", "b").alias("v"))
        )
        assert _bits(state) <= 64  # would be ~4x per round without the cut
    assert state.count() == 20


def test_cc_long_chain_distributed_converges(spark):
    # 256-node chain: diameter 255 forces many pointer-jumping rounds —
    # the regime where checkpoint-carried stats previously stalled
    # planning (non-terminating before the fix; seconds after)
    from binaryx_graph_spark.operators.dedup import connected_components

    pairs = spark.range(256).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = connected_components(pairs, local_max_edges=0)
    rows = out.collect()
    assert len(rows) == 257
    assert {r["cluster_id"] for r in rows} == {0}  # one chain, min-id root
