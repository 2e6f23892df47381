"""Streaming deduplication: dropDuplicatesWithinWatermark removes
duplicate keys arriving across micro-batches within the watermark delay
— the streaming twin of the batch exact-dedup operator."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_stream_dedup_within_watermark(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.LongType())]
    )
    src = tmp_path / "src"
    src.mkdir()

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name)
        )
        for f in glob.glob(str(tmp_path / "stage" / name / "part-*.parquet")):
            shutil.copy(f, str(src / f"{name}.parquet"))

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    stream = spark.readStream.schema(schema).parquet(str(src))
    deduped = stream.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(["k"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        write_batch("b1", [(t0, 1), (t0, 1), (t0 + dt.timedelta(minutes=1), 2)])
        q.processAllAvailable()
        # duplicate key 1 arrives again in a LATER micro-batch, still
        # within the 30-minute watermark window → dropped
        write_batch("b2", [(t0 + dt.timedelta(minutes=2), 1), (t0 + dt.timedelta(minutes=3), 3)])
        q.processAllAvailable()
    finally:
        q.stop()

    ks = sorted(r["k"] for r in spark.table("dedup_sink").collect())
    assert ks == [1, 2, 3]  # each key exactly once, cross-batch dup removed
