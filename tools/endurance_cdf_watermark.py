"""Endurance: CDF watermark consumers must hold BOUNDED state.

Drives N waves of warehouse commits with monotonically advancing event
times through (a) the watermarked windowed aggregation and (b) the
two-feed stream-stream join, sampling the state store's
``numRowsTotal`` from ``lastProgress`` after every wave.  The claim
under test: watermark eviction keeps state at O(one watermark window),
so the row count PLATEAUS instead of growing with the stream — the
difference between a consumer that survives 100 TB of feed and one
that OOMs its state store.

Usage: python -m tools.endurance_cdf_watermark [waves]
Prints one JSON line {waves, agg_state, join_state, agg_bounded,
join_bounded}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _state_rows(q) -> int:
    p = q.lastProgress
    if not p:
        return 0
    ops = p.get("stateOperators") or []
    return sum(int(o.get("numRowsTotal", 0)) for o in ops)


def main(waves: int = 12) -> None:
    from binaryx_graph_spark.sources import warehouse as wh_mod
    from binaryx_graph_spark.sources.warehouse import Warehouse
    from binaryx_graph_spark.streaming.cdf_consumers import (
        cdf_two_feed_join,
        cdf_windowed_query,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bxg_endurance_cdfwm_")
    wh = Warehouse(spark, root)
    if "functions_replica" not in wh_mod.MERGE_KEYS:
        wh_mod.MERGE_KEYS["functions_replica"] = ["uid"]
        wh_mod.ALL_TABLES["functions_replica"] = wh_mod.ALL_TABLES["functions"]

    rows_per_wave = 2000

    def batch(wave: int, *, lag: int = 0) -> object:
        base = 1_000_000 + wave * rows_per_wave
        return spark.range(rows_per_wave).select(
            F.concat(F.lit(f"w{wave}_"), F.col("id")).alias("uid"),
            F.lit("fn").alias("name"),
            F.lit("").alias("address"),
            (F.lit(base) + F.col("id") + F.lit(lag)).cast("long").alias("size"),
            F.lit("Internal").alias("type"),
        )

    wh.merge_batch_incremental({"functions": batch(0)}, n_buckets=8)
    wh.merge_batch_incremental({"functions_replica": batch(0, lag=3)}, n_buckets=8)

    name = f"endur_agg_{uuid.uuid4().hex[:8]}"
    q_agg = cdf_windowed_query(
        spark, root, "functions",
        window="10 seconds", watermark="10 seconds",
        queryName=name, checkpoint=os.path.join(root, "_ckpt_agg"),
    )
    jname = f"endur_join_{uuid.uuid4().hex[:8]}"
    q_join = (
        cdf_two_feed_join(
            spark, root, "functions", "functions_replica",
            lag_bound_s=30, watermark="60 seconds",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(jname)
        .option("checkpointLocation", os.path.join(root, "_ckpt_join"))
        .start()
    )
    agg_hist: list[int] = []
    join_hist: list[int] = []
    try:
        for wave in range(1, waves + 1):
            wh.merge_batch_incremental(
                {"functions": batch(wave)}, batch_seq=wave + 1
            )
            wh.merge_batch_incremental(
                {"functions_replica": batch(wave, lag=3)}, batch_seq=wave + 1
            )
            q_agg.processAllAvailable()
            q_join.processAllAvailable()
            agg_hist.append(_state_rows(q_agg))
            join_hist.append(_state_rows(q_join))
    finally:
        q_agg.stop()
        q_join.stop()

    def bounded(hist: list[int]) -> bool:
        # plateau test: the last third must not exceed the middle
        # third's max by more than 20% — linear growth fails this
        third = max(1, len(hist) // 3)
        return max(hist[-third:]) <= max(hist[third : 2 * third]) * 1.2

    print(
        json.dumps(
            {
                "waves": waves,
                "rows_per_wave": rows_per_wave,
                "agg_state": agg_hist,
                "join_state": join_hist,
                "agg_bounded": bounded(agg_hist),
                "join_bounded": bounded(join_hist),
            }
        )
    )
    spark.stop()
    if not (bounded(agg_hist) and bounded(join_hist)):
        sys.exit(1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 12)
