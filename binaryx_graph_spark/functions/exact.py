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


# Scale knob (SCALE.md "known ceilings"): int64 cents sums overflow near
# 9.2e18. A q1-style triple product (price_c × disc_c × tax_c ≈ 1e11 per
# row) caps a single group at ~9e7 rows; beyond that the sum switches to
# decimal(38,0) — still exact, still order-independent, ~2× slower. The
# switch is a session conf so a 100 TB deployment flips ONE setting:
#
#     spark.conf.set("spark.graft.cents.wide", "true")
#
# The per-row cents PRODUCTS stay int64 (≤ ~1e11, comfortably in range);
# only the group SUM widens.

WIDE_CENTS_CONF = "spark.graft.cents.wide"


def wide_cents_enabled(spark) -> bool:
    """Read the decimal(38,0) cents-sum knob from the session conf."""
    try:
        return str(spark.conf.get(WIDE_CENTS_CONF, "false")).lower() == "true"
    except Exception:
        return False


def sum_cents_exact(expr: Column, *, wide: bool = False) -> Column:
    """Overflow-proof exact sum of an integer-cents expression.

    ``wide=False``: plain ``sum(long)`` — exact to ±9.2e18 (sufficient for
    every test SF and the DuckDB-oracle parity path).
    ``wide=True``: ``sum(decimal(38,0))`` — exact to 1e38, no int64
    ceiling at 1e9-row-per-group scale. Downstream ``/ 100.0`` divisions
    produce the same double either way (exact integer → nearest double is
    representation-independent).
    """
    if wide:
        return F.sum(expr.cast("decimal(38,0)"))
    return F.sum(expr)
