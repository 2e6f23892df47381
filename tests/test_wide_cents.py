"""Overflow-proof cents sums (SCALE.md "known ceilings" → VERDICT r1 #9):
the spark.graft.cents.wide knob must survive group sums that overflow
int64 — the 1e9-row-per-group regime of a real 100 TB pass."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.functions.exact import (
    WIDE_CENTS_CONF,
    sum_cents_exact,
    wide_cents_enabled,
)

# 2,000,000 rows × 1e13 cents = 2e19 > int64 max (9.22e18): the exact
# shape of a q1 triple-product (≈1e11/row) group at ~1e8-1e9 rows,
# shrunk to test scale by making each row bigger instead of more rows.
N_ROWS = 2_000_000
PER_ROW = 10**13


def test_wide_sum_survives_int64_overflow(spark):
    df = spark.range(N_ROWS).select(F.lit(PER_ROW).cast("long").alias("c"))
    out = df.agg(sum_cents_exact(F.col("c"), wide=True).alias("s")).collect()[0]["s"]
    assert int(out) == N_ROWS * PER_ROW  # exact — no wrap, no float fuzz


def test_narrow_sum_overflows_int64(spark):
    """The narrow path genuinely cannot represent this sum — proving the
    knob is load-bearing, not decorative. Under ANSI it throws; under
    non-ANSI it wraps to a wrong value."""
    df = spark.range(N_ROWS).select(F.lit(PER_ROW).cast("long").alias("c"))
    try:
        out = df.agg(sum_cents_exact(F.col("c"), wide=False).alias("s")).collect()[0]["s"]
    except Exception:
        return  # ANSI overflow error — expected
    assert int(out) != N_ROWS * PER_ROW  # non-ANSI wrap


def test_q1_identical_under_wide_knob(spark):
    """q1 must produce the SAME doubles with the knob on and off at test
    scale — widening changes the ceiling, never the values."""
    from binaryx_graph_spark.queries.relational import q1_pricing_summary

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("testdata missing")
    assert not wide_cents_enabled(spark)
    base = q1_pricing_summary(spark, sf_dir).collect()
    spark.conf.set(WIDE_CENTS_CONF, "true")
    try:
        assert wide_cents_enabled(spark)
        wide = q1_pricing_summary(spark, sf_dir).collect()
    finally:
        spark.conf.set(WIDE_CENTS_CONF, "false")
    assert [r.asDict() for r in base] == [r.asDict() for r in wide]
