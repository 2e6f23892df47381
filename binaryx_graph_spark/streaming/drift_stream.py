"""Streaming drift monitoring: PSI of a live metric stream against a
fixed reference window, maintained incrementally per micro-batch.

Production shape: the reference bin histogram is computed once (the
vetted training slice); each arriving micro-batch adds its own bin
counts to the accumulated CURRENT histogram — O(n_bins) state rows, no
raw events retained — and the PSI scorer can run after any batch.

Contract (gate-pinned): micro-batches partition the current slice, so
per-bin counts are exactly additive — the drained histogram's PSI
equals the one-shot batch pass (``events_drift_psi``) bit-for-bit,
including the driver-libm log2 quantization, because the scorer sees
identical integer counts.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import load_table

BIN_SCHEMA = T.StructType([T.StructField("bin", T.LongType())])


def streaming_drift_psi(
    spark: SparkSession,
    sf_dir: str,
    *,
    n_bins: int = 10,
    bin_cents: int = 5_000,
    arrival_batches: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """The streaming twin of ``events_drift_psi``: reference histogram
    = days 1-15 (one static aggregation), current slice (days 16+)
    replayed as ascending event_id-range micro-batches; each
    foreachBatch adds its per-bin counts into the accumulated
    histogram.  Output: the PSI scorer over (reference, drained
    current) — bit-identical to the batch pass."""
    from ..operators.sketch import drift_psi_from_counts

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        # greatest(0, …): clamp negative values into bin 0, matching the
        # batch twin and the oracle (Spark div truncates, DuckDB // floors
        # — without the clamp a negative value bins differently; ADVICE r6)
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_bins - 1),
                F.expr(f"CAST(round(value * 100) AS BIGINT) div {bin_cents}"),
            ),
        ).alias("bin"),
        F.when(F.dayofmonth("ts") <= 15, F.lit(0)).otherwise(F.lit(1)).alias("cur"),
    )
    ref_counts = (
        ev.filter(F.col("cur") == 0)
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("ref_n"))
        .localCheckpoint(eager=True)
    )

    cur = ev.filter(F.col("cur") == 1)
    max_id = cur.agg(F.max("event_id")).collect()[0][0]  # setup-only scalar
    if max_id is None:  # no current slice: score reference against empty
        if stats is not None:
            stats["n_batches"] = 0
        counts = ref_counts.withColumn("cur_n", F.lit(0).cast("long"))
        return drift_psi_from_counts(counts, n_bins=n_bins)

    stage = tempfile.mkdtemp(prefix="bxg_drift_stream_")
    bounds = [(i * (max_id + 1)) // arrival_batches for i in range(arrival_batches + 1)]
    for b in range(arrival_batches):
        tmp = f"{stage}/_w{b}"
        (
            cur.filter(
                (F.col("event_id") >= bounds[b]) & (F.col("event_id") < bounds[b + 1])
            )
            .select("bin")
            .coalesce(1)
            .write.parquet(tmp)
        )
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        os.rename(f"{tmp}/{part}", f"{stage}/batch_{b}.parquet")
        shutil.rmtree(tmp)

    state = {
        "hist": spark.createDataFrame([], "bin long, cur_n long").localCheckpoint(
            eager=True
        ),
        "n_batches": 0,
    }

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        part = batch_df.groupBy("bin").agg(
            F.count(F.lit(1)).cast("long").alias("cur_n")
        )
        state["hist"] = (
            state["hist"]
            .unionByName(part)
            .groupBy("bin")
            .agg(F.sum("cur_n").cast("long").alias("cur_n"))
            .localCheckpoint(eager=True)
        )
        state["n_batches"] += 1

    q = (
        spark.readStream.schema(BIN_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(stage, ignore_errors=True)

    if stats is not None:
        stats["n_batches"] = state["n_batches"]
    counts = ref_counts.join(state["hist"], "bin", "full").select(
        "bin",
        F.coalesce("ref_n", F.lit(0)).cast("long").alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).cast("long").alias("cur_n"),
    )
    return drift_psi_from_counts(counts, n_bins=n_bins)
