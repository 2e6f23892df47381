"""Bloom-prefilter semi-join: pruning really happens, output is lossless."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.bloom import bloom_bitmap, bloom_semi_join, in_bloom

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_bloom_semi_join_equals_exact(spark):
    """Bloom + exact join must equal the plain semi-join row-for-row
    (false positives culled, no false negatives possible)."""
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").filter(F.col("c_custkey") % 7 == 2)
    got = sorted(
        r["o_orderkey"]
        for r in bloom_semi_join(orders, "o_custkey", cust, "c_custkey")
        .select("o_orderkey")
        .collect()
    )
    keys = cust.select(F.col("c_custkey").alias("o_custkey")).distinct()
    want = sorted(
        r["o_orderkey"]
        for r in orders.join(keys, "o_custkey", "left_semi").select("o_orderkey").collect()
    )
    assert got == want and len(got) > 0


def test_bloom_prefilter_actually_prunes(spark):
    """The bitmap predicate must reject a large share of non-matching
    probe rows (≥ half of them at ~1/7 key selectivity) — otherwise the
    operator is a no-op tax."""
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer").filter(F.col("c_custkey") % 7 == 2)
    bitmap = bloom_bitmap(cust.select("c_custkey").distinct(), "c_custkey")
    total = orders.count()
    kept = orders.filter(in_bloom("o_custkey", bitmap)).count()
    matching = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(), "o_custkey", "left_semi"
    ).count()
    assert matching <= kept <= total  # no false negatives
    non_matching = total - matching
    false_pos = kept - matching
    assert false_pos <= non_matching / 2, (total, kept, matching)


def test_bloom_bitmap_ignores_null_keys(spark):
    """NULL keys in the small side must not crash the bitmap build (the
    plain semi-join the operator equals ignores NULLs), and the semi-join
    output must still match the exact one."""
    small = spark.createDataFrame(
        [(1,), (None,), (5,)], "k bigint"
    )
    bitmap = bloom_bitmap(small, "k")
    assert len(bitmap) == 256
    large = spark.createDataFrame([(i,) for i in range(20)], "k bigint")
    got = sorted(r["k"] for r in bloom_semi_join(large, "k", small, "k").collect())
    assert got == [1, 5]
