"""Count-Min Sketch invariants: overestimate-only, exactness when
collision-free, mergeability, and the classic error bound on the test
corpus."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.sketch import cms_build, cms_estimate

SF = "/root/testdata/sf0.001"


def test_cms_never_underestimates_and_bounded(spark):
    ev = load_table(spark, SF, "events")
    sketch = cms_build(ev, F.col("user_id"))
    probes = ev.select("user_id").distinct().limit(50)
    est = {r["user_id"]: r["est"] for r in cms_estimate(sketch, probes, "user_id").collect()}
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = ev.count()
    # CMS guarantee: true <= est <= true + (e/width)*N (w.h.p.; with
    # depth=4 the failure prob is e^-4, so assert the bound outright on
    # this fixed corpus)
    bound = (2.71828 / 256) * n_total + 1
    for uid, e in est.items():
        assert e >= exact[uid], (uid, e, exact[uid])
        assert e <= exact[uid] + bound, (uid, e, exact[uid], bound)


def test_cms_merge_equals_single_build(spark):
    """Sketch of (A ∪ B) == merge(sketch(A), sketch(B)) — the mergeable
    property that makes it a distributed-aggregation citizen."""
    ev = load_table(spark, SF, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, F.col("user_id"))
        .unionByName(cms_build(b, F.col("user_id")))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    single = cms_build(ev, F.col("user_id"))
    diff = merged.join(single, ["d", "bucket"], "full").filter(
        F.coalesce(merged.cnt, F.lit(0)) != F.coalesce(single.cnt, F.lit(0))
    )
    assert diff.isEmpty()


def test_hll_estimate_accuracy_and_mergeability(spark):
    """HLL estimate within 3σ (σ ≈ 1.04/√64 = 13%) of the exact distinct
    count, and register tables merge by MAX (the mergeable property)."""
    from binaryx_graph_spark.operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, SF, "events")
    exact = ev.select("event_id").distinct().count()
    regs = hll_registers(ev, F.col("event_id"))
    est = hll_estimate(spark, regs).collect()[0].hll_estimate
    assert abs(est - exact) / exact < 0.40, (est, exact)

    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        hll_registers(a, F.col("event_id"))
        .unionByName(hll_registers(b, F.col("event_id")))
        .groupBy("reg")
        .agg(F.max("m_val").alias("m_val"))
    )
    single = hll_registers(ev, F.col("event_id"))
    diff = merged.join(single, "reg", "full").filter(
        F.coalesce(merged.m_val, F.lit(-1)) != F.coalesce(single.m_val, F.lit(-1))
    )
    assert diff.isEmpty()
