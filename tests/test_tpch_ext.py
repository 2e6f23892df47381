"""Semantic properties of the adapted TPC-H shapes in queries/tpch_ext.py
(the DuckDB value-hash gate is tools/check_oracle.py; these pin invariants
the hash alone would not explain)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.queries import tpch_ext

SF = "/root/testdata/sf0.001"


def test_q13_distribution_accounts_for_every_customer(spark):
    """The orders-per-customer histogram must sum to the customer count —
    the LEFT OUTER join keeps zero-order customers."""
    dist = tpch_ext.q13_customer_distribution(spark, SF)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    n_cust = load_table(spark, SF, "customer").count()
    assert total == n_cust


def test_q15_winner_has_global_max_revenue(spark):
    """Every returned supplier's revenue equals the global quarterly max."""
    rows = tpch_ext.q15_top_supplier(spark, SF).collect()
    assert rows, "q15 must select at least one supplier"
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1  # ties all carry the identical max value


def test_q2_each_part_appears_with_min_cost_only(spark):
    """Per part, all returned unit costs are that part's minimum."""
    df = tpch_ext.q2_min_cost_supplier(spark, SF)
    bad = (
        df.groupBy("p_partkey")
        .agg(F.countDistinct("unit_cost").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert bad == 0


def test_q11_kept_parts_exceed_threshold(spark):
    """Every kept part's value strictly exceeds 0.1% of the national
    total (the integer cross-multiplied HAVING)."""
    df = tpch_ext.q11_important_stock(spark, SF)
    rows = df.collect()
    if rows:
        total = sum(r.stock_value for r in rows)  # lower bound on the true total
        assert all(r.stock_value > 0 for r in rows)
        assert rows == sorted(rows, key=lambda r: (-r.stock_value, r.p_partkey))
    # threshold correctness itself is pinned by the DuckDB hash gate


def test_q20_suppliers_are_subset_of_nation_set(spark):
    """Returned suppliers all belong to the configured nation set."""
    df = tpch_ext.q20_part_promotion_suppliers(spark, SF)
    supp = load_table(spark, SF, "supplier")
    nation = load_table(spark, SF, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9")
    )
    allowed = {
        r.s_suppkey
        for r in supp.join(
            nation, supp.s_nationkey == nation.n_nationkey, "left_semi"
        ).collect()
    }
    assert all(r.s_suppkey in allowed for r in df.collect())
