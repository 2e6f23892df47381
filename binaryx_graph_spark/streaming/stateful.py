"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star §2.12: the reference has no streaming; a 100 TB pipeline
needs arbitrary keyed state).

Per-user running totals over the events stream: state = (n_events,
value_cents, last_ts_us); every micro-batch emits the updated snapshot
per user seen in that batch. Emissions are monotone in ``n_events``, so
a consumer (or the gate query) can reduce to the final snapshot with a
max-per-key regardless of how many micro-batches the source was split
into — no single-batch assumption.
"""

from __future__ import annotations

import math
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .ingest_stream import _events_stream

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, cents, last_us = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer cents, HALF-UP away from zero — the same convention
        # as the batch engine's F.round and the DuckDB oracle. Python's
        # built-in round() is banker's (half-to-even: round(0.125*100)=12,
        # F.round gives 13) — ADVICE r1.
        cents += sum(
            int(math.floor(abs(v) * 100 + 0.5)) * (1 if v >= 0 else -1) for v in pdf["value"]
        )
        # ts arrives as a proper timestamp (unit-probed upstream in
        # _events_stream); pandas Timestamp.value is always nanoseconds.
        last_us = max(last_us, int(pd.Timestamp(pdf["ts"].max()).value) // 1000)
    state.update((n, cents, last_us))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_cents": [cents], "last_ts_us": [last_us]}
    )


def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful aggregation over the (staged) events stream to
    completion; return the FINAL per-user snapshot (max n_events row per
    user — monotone emissions make this exact)."""
    sink = f"user_totals_{uuid.uuid4().hex[:8]}"

    events = _events_stream(spark, sf_dir, prefix="bxg_state_")
    totals = events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        totals.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pyspark.sql.window import Window

    snap = spark.table(sink)
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        snap.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
