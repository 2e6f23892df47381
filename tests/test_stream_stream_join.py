"""Stream-stream join with watermarks + time-range condition — the last
major Structured Streaming feature class (both sides unbounded, state
bounded by the interval condition)."""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("kind", T.StringType()),
    ]
)


def _writer(spark, tmp_path, name):
    d = tmp_path / name
    d.mkdir()

    def write(batch, rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "stage" / name / batch)
        )
        for f in glob.glob(str(tmp_path / "stage" / name / batch / "part-*.parquet")):
            shutil.copy(f, str(d / f"{batch}.parquet"))

    return d, write


def test_stream_stream_interval_join(spark, tmp_path):
    clicks_dir, write_clicks = _writer(spark, tmp_path, "clicks")
    buys_dir, write_buys = _writer(spark, tmp_path, "buys")

    clicks = (
        spark.readStream.schema(SCHEMA).parquet(str(clicks_dir))
        .withWatermark("ts", "1 hour")
        .select(F.col("ts").alias("click_ts"), F.col("user_id").alias("c_user"))
    )
    buys = (
        spark.readStream.schema(SCHEMA).parquet(str(buys_dir))
        .withWatermark("ts", "1 hour")
        .select(F.col("ts").alias("buy_ts"), F.col("user_id").alias("b_user"))
    )
    # purchase attributed to a click within the preceding 30 minutes
    joined = buys.join(
        clicks,
        (F.col("b_user") == F.col("c_user"))
        & (F.col("buy_ts") >= F.col("click_ts"))
        & (F.col("buy_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    try:
        write_clicks("b1", [(t0, 1, "click"), (t0, 2, "click")])
        q.processAllAvailable()
        # user 1 buys 10 min after the click (inside the interval);
        # user 2 buys 2 hours later (outside) — must not join
        write_buys(
            "b1",
            [
                (t0 + dt.timedelta(minutes=10), 1, "buy"),
                (t0 + dt.timedelta(hours=2), 2, "buy"),
            ],
        )
        q.processAllAvailable()
    finally:
        q.stop()

    rows = spark.table("ss_join").collect()
    assert len(rows) == 1
    assert rows[0]["b_user"] == 1
