"""Approximate-aggregate accuracy (the 100 TB substitutes)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table

SF = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    for k, n_exact in exact.items():
        rel_err = abs(approx[k] - n_exact) / n_exact
        assert rel_err < 0.1, f"{k}: approx={approx[k]} exact={n_exact} rel_err={rel_err:.3f}"


def test_percentile_approx_brackets_exact_median(spark):
    ev = load_table(spark, SF, "events")
    approx_median = ev.agg(F.percentile_approx("value", 0.5, 10000).alias("m")).collect()[0]["m"]
    exact_median = ev.agg(F.expr("percentile(value, 0.5)").alias("m")).collect()[0]["m"]
    assert abs(approx_median - exact_median) / exact_median < 0.05
