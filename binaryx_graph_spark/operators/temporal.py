"""Temporal join operators (north-star: Spark lacks a native as-of join;
the composition below is exact, with DuckDB's native ASOF JOIN as the
independent oracle).

Scale posture: the formulation shuffles once on the join key and sorts
within partitions — the same cost profile as a per-key `merge_asof`.
For heavily skewed keys, pre-bucket the time axis (equi-join on bucket
+ filter) or use `applyInPandas` + `pd.merge_asof` per key group; both
alternatives keep the shuffle-on-key shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row (uniquely identified by ``left_id``), attach the
    LATEST right row with ``right.ts <= left.ts`` for the same ``on`` key;
    left join semantics — unmatched rows keep nulls.

    The right side must be unique per (key, ts) for deterministic output —
    dedupe upstream.

    Exact formulation: key-equi join + time filter + row_number keeping
    the greatest right timestamp per left row. Matches DuckDB
    ``ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts``.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    r = right.select(
        F.col(on).alias("_r_key"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(c + suffix) for c in rcols],
    )
    joined = left.join(
        r, (left[on] == F.col("_r_key")) & (F.col("_r_ts") <= left[left_ts]), "left"
    )
    w = Window.partitionBy(left_id).orderBy(F.desc("_r_ts"))
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_r_key", "_r_ts")
    )


def interval_bin_join(
    facts: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    *,
    bin_seconds: int,
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Range join [start, end) as a pure EQUI-join: the fact×fact scale
    path a broadcast nested-loop range join cannot take.

    Technique (the standard interval-binning rewrite): bucket time into
    ``bin_seconds`` bins; each fact row lands in exactly one bin, each
    interval EXPLODES into the ⌈len/bin⌉(+1) bins it overlaps, and the
    candidate join is bin-equality — a hash-partitioned shuffle join on
    an integer key — followed by the exact residual predicate.  Choosing
    bin_seconds ≈ the typical interval length caps the explode factor at
    ~2 while keeping bins selective.

    At 100 TB neither side needs to fit in memory: both shuffle on
    ``_bin`` (skewed bins split by AQE), unlike the broadcast-NLJ
    formulation which requires a dimension-sized interval table.
    ``extra_keys`` (columns present on BOTH sides, e.g. the entity id)
    join alongside the bin — the usual per-entity temporal-window shape
    — making the shuffle key (entity, bin) and bin skew a non-issue.
    Returns the joined rows (all columns of both inputs).
    """
    b_facts = facts.withColumn(
        "_bin", F.expr(f"unix_timestamp({ts_col}) div {bin_seconds}")
    )
    b_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_timestamp({start_col}) div {bin_seconds}"),
                F.expr(f"(unix_timestamp({end_col}) - 1) div {bin_seconds}"),
            )
        ),
    )
    return (
        b_facts.join(b_iv, ["_bin"] + list(extra_keys or []))
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bin")
    )
