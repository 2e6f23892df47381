"""Skew-handling utilities (100 TB posture).

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains necessary for skewed AGGREGATIONS and
for joins whose skew AQE cannot see (e.g. exploded edge lists where one
hub node dominates — exactly the hot-function / hot-string shape this
engine's call graphs produce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, *, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt 0..buckets-1 derived from a sibling row hash —
    spreads one hot key over ``buckets`` reducers."""
    return df.withColumn(salt_col, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(buckets)))


def salted_count(df: DataFrame, key: str, *, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe count per key: partial count on (key, salt),
    final sum on key. The partial shuffle spreads a hot key over
    ``buckets`` partitions instead of one."""
    salted = with_salt(df, key, buckets=buckets)
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(key).agg(F.sum("_pc").alias("n"))


def broadcast_salted_join(
    big: DataFrame, small: DataFrame, key: str, *, buckets: int = 8
) -> DataFrame:
    """Skewed big⋈small equi-join: replicate the small side ``buckets``×
    with an explicit salt, salt the big side, join on (key, salt).
    Use when the small side is broadcastable-ish but the big side's key
    distribution would overload single reducers in a shuffle join."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = with_salt(big, key, buckets=buckets)
    return big_salted.join(F.broadcast(small_rep), [key, "_salt"]).drop("_salt")
