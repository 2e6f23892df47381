"""Grouped-map ``applyInPandas`` demonstrator: per-key distribution
statistics computed in Arrow batches with EXACT integer internals.

This pins the remaining Python-boundary API the engine uses nowhere
else: batch grouped-map (``groupBy().applyInPandas``) — the escape
hatch for per-group logic Spark's built-ins can't express (per-group
model fits, scipy calls, custom resampling).  The kernel here is
deliberately re-expressible in SQL so the DuckDB oracle can verify the
ARROW PATH itself: if group splitting, Arrow conversion, or pandas
dtype handling corrupted anything, the value hash would diverge.

Determinism contract (the same rules as the Column engine):
- dollars → cents via half-up away-from-zero (matches F.round/DuckDB),
  summed as int64 (order-independent);
- mean = (s / 100.0) / n and std = sqrt(n·s2 − s²) / 100.0 / n with the
  IDENTICAL operation order on all three engines (numpy int64 sums are
  exact; the single int→double conversion and the IEEE sqrt/divisions
  are deterministic and shared).
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STATS_SCHEMA = "user_id bigint, n_events bigint, mean_value double, std_value double"


def _cents(v: pd.Series) -> "pd.Series":
    """Half-up away-from-zero dollars→cents, the engine-wide convention
    (see streaming/stateful.py and functions/exact.py)."""
    import numpy as np

    a = v.to_numpy()
    return pd.Series(
        (np.floor(np.abs(a) * 100 + 0.5) * np.sign(a)).astype("int64"), index=v.index
    )


def user_value_stats(events: DataFrame) -> DataFrame:
    """Per-user value statistics via grouped-map applyInPandas →
    (user_id, n_events, mean_value, std_value).

    Scale: the shuffle is the groupBy's hash partitioning on user_id —
    identical movement to a built-in aggregate; each Arrow batch holds
    one user's rows.  Population std via the exact integer identity
    n·Σx² − (Σx)² (never negative, no catastrophic cancellation —
    int64 holds it up to ~3e18 cents²-rows)."""

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        c = _cents(pdf["value"])
        n = len(c)
        s = int(c.sum())
        s2 = int((c * c).sum())
        m = n * s2 - s * s
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "mean_value": [(s / 100.0) / n],
                "std_value": [math.sqrt(m) / 100.0 / n],
            }
        )

    return events.select("user_id", "value").groupBy("user_id").applyInPandas(
        f, STATS_SCHEMA
    )


def user_value_stats_column(events: DataFrame) -> DataFrame:
    """Pure-Column twin of :func:`user_value_stats` (the hot path if
    this ever left demo duty) — pinned equal in tests."""
    c = (
        F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)) * F.signum("value")
    ).cast("long")
    agg = events.select("user_id", c.alias("c")).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    m = agg["n_events"] * agg["s2"] - agg["s"] * agg["s"]
    return agg.select(
        "user_id",
        "n_events",
        ((F.col("s") / F.lit(100.0)) / F.col("n_events")).alias("mean_value"),
        (F.sqrt(m.cast("double")) / F.lit(100.0) / F.col("n_events")).alias("std_value"),
    )


SQL_USER_VALUE_STATS = """
    WITH cents AS (
      SELECT user_id,
             CAST(floor(abs(value) * 100 + 0.5) * CASE WHEN value < 0 THEN -1 ELSE 1 END
                  AS BIGINT) AS c
      FROM events
    ),
    agg AS (
      SELECT user_id, count(*) AS n_events,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM cents GROUP BY user_id
    )
    SELECT user_id, n_events,
           (s / 100.0) / n_events AS mean_value,
           sqrt(CAST(n_events * s2 - s * s AS DOUBLE)) / 100.0 / n_events AS std_value
    FROM agg
"""
