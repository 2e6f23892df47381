"""CDF consumers: watermark late-drop under REAL multi-batch
processing, and the two-feed stream-stream join vs its batch twin."""

from __future__ import annotations

import os
import uuid

import pyspark.sql.functions as F

from binaryx_graph_spark.sources import warehouse as wh_mod
from binaryx_graph_spark.sources.warehouse import Warehouse
from binaryx_graph_spark.streaming.cdf_consumers import (
    cdf_two_feed_join,
    cdf_windowed_query,
)


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(u, "fn", "", s, "Internal") for u, s in pairs],
        "uid string, name string, address string, size long, type string",
    )


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch_incremental(
        {"functions": _rows(spark, [(str(i), 1000 + (i % 100)) for i in range(500)])},
        n_buckets=4,
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = cdf_windowed_query(
        spark, root, "functions",
        window="10 seconds", watermark="10 seconds",
        queryName=name, checkpoint=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        n1 = spark.table(name).count()
        assert n1 == 8  # watermark 1089: windows ending 1010..1080
        # batch 2: one LATE row (ts=1000 < watermark) + one on-time
        wh.merge_batch_incremental(
            {"functions": _rows(spark, [("late", 1000), ("ontime", 1114)])},
            batch_seq=2,
        )
        q.processAllAvailable()
    finally:
        q.stop()
    out = {r["win_start"]: r["n_rows"] for r in spark.table(name).collect()}
    # all ten snapshot windows closed; the late row did NOT bump 1000's
    # count; the on-time row's own window (1110, still open) not emitted
    assert out == {1000 + 10 * i: 50 for i in range(10)}


def test_two_feed_join_equals_batch_twin(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    if "functions_replica" not in wh_mod.MERGE_KEYS:
        wh_mod.MERGE_KEYS["functions_replica"] = ["uid"]
        wh_mod.ALL_TABLES["functions_replica"] = wh_mod.ALL_TABLES["functions"]
    primary = [(str(i), 1000 + i) for i in range(100)]
    # replica: even uids, lag = i mod 40 (some beyond the 30s bound)
    replica = [(str(i), 1000 + i + (i % 40)) for i in range(0, 100, 2)]
    wh.merge_batch_incremental({"functions": _rows(spark, primary)}, n_buckets=4)
    wh.merge_batch_incremental(
        {"functions_replica": _rows(spark, replica)}, n_buckets=4
    )
    name = f"join_{uuid.uuid4().hex[:8]}"
    q = (
        cdf_two_feed_join(
            spark, root, "functions", "functions_replica",
            lag_bound_s=30, watermark="60 seconds",
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["uid"], r["lag_s"]) for r in spark.table(name).collect()
    )
    want = sorted(
        (str(i), i % 40) for i in range(0, 100, 2) if (i % 40) <= 30
    )
    assert got == want
