"""Exact-arithmetic helpers for oracle-stable aggregation.

The testdata's monetary doubles are 2-decimal aligned, so aggregating in
integer *cents* makes every sum exact and order-independent — the same
value on Spark and DuckDB regardless of partitioning or shuffle order.
(Plain ``sum(double)`` differs in the last ulps between engines because
floating-point addition is not associative.)

Pattern (both sides compute bit-identical results):

    Spark : F.sum(cents("x"))            → long
    DuckDB: CAST(sum(CAST(round(x*100) AS BIGINT)) AS BIGINT)

then a single long→double division (``/100.0``) to present dollars.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """double dollars (2-decimal aligned) → exact integer cents."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def dollars(cents_col: Column) -> Column:
    """exact integer cents → double dollars (single exact division)."""
    return (cents_col / F.lit(100.0)).cast("double")


def sql_cents(expr: str) -> str:
    """DuckDB twin of :func:`cents`."""
    return f"CAST(round(({expr}) * 100) AS BIGINT)"


def sql_sum_cents(expr: str) -> str:
    """DuckDB ``sum`` of cents cast back to BIGINT (DuckDB sums BIGINT into
    HUGEINT, which would mismatch Spark's long schema)."""
    return f"CAST(sum({sql_cents(expr)}) AS BIGINT)"


# Scale note (SCALE.md "known ceilings"): int64 cents sums overflow near
# 9.2e18. A q1-style triple product (price_c × disc_c × tax_c ≈ 1e11 per
# row) caps a single group at ~9e7 rows; beyond that switch the sum to
# decimal(38,0):  F.sum(expr.cast("decimal(38,0)")) — still exact, still
# order-independent, ~2× slower.
