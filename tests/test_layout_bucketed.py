"""The registered layout_bucketed_join query: values equal the plain
join, the layout is reused across calls, and the in-query plan guard
holds (test_bucketed_join.py proves the negative control — a plain
parquet join DOES shuffle — so the guard is meaningful)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.bucketing import (
    colocated_priority_revenue,
    ensure_bucketed_pair,
)

SF_DIR = "/root/testdata/sf0.001"


def test_colocated_revenue_matches_plain_join(spark):
    got = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in colocated_priority_revenue(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round((1 - F.col("l_discount")) * 100).cast("long")
    want = {
        r["o_orderpriority"]: (r["n_items"], r["revenue"])
        for r in (
            o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                (F.sum(price_c * disc_c) / F.lit(10000.0)).alias("revenue"),
            )
            .collect()
        )
    }
    assert got == want and len(got) > 0


def test_bucketed_pair_is_idempotent(spark):
    a = ensure_bucketed_pair(spark, SF_DIR)
    b = ensure_bucketed_pair(spark, SF_DIR)
    assert a == b
    for t in a:
        assert spark.catalog.tableExists(t)
