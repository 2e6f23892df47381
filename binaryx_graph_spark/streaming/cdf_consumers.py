"""Consumers OVER the warehouse change feed — watermarked event-time
aggregation and the two-feed stream-stream join (the replica-lag
monitor shape).

The CDF source (`sources/cdf_stream.py`) is exactly-once but
append-shaped: rows arrive as (row columns, _change, _version).  These
consumers certify that it COMPOSES with Structured Streaming's stateful
operators:

* :func:`cdf_windowed_query` — event-time tumbling-window aggregation
  under a watermark, APPEND output mode: a window only emits once the
  watermark passes its end, and a row arriving in a later commit with
  an event time older than the watermark is DROPPED (the late-data
  contract).  Event time is derived from a data column
  (``timestamp_seconds(size)``) — the warehouse feed carries no
  ingestion time by design: commits are batch, event time belongs to
  the data.
* :func:`cdf_two_feed_join` — stream-stream INNER join of two tables'
  change feeds on key + event-time range, both sides watermarked: the
  replica-lag monitor (which primary rows arrived on the replica, and
  inside the lag bound).  Spark keeps each side's state only within
  the watermark/range bound, so state is O(rows in the lag window),
  not O(stream) — the endurance tool
  (`tools/endurance_cdf_watermark.py`) measures exactly that.

Scale shape: both consumers inherit the CDF source's manifest-diff
planning (one InputPartition per changed bucket per version — untouched
buckets never open), and the stateful operators shuffle on the window /
join key like any streaming agg.  At 100 TB the state store holds one
lag-bound's worth of keys, bounded by the watermark eviction the
endurance tool pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cdf_stream import register_warehouse_cdf_datasource


def cdf_feed(spark: SparkSession, root: str, table: str) -> DataFrame:
    register_warehouse_cdf_datasource(spark)
    return (
        spark.readStream.format("warehouse_cdf")
        .option("root", root)
        .option("table", table)
        .load()
    )


def cdf_windowed_query(
    spark: SparkSession,
    root: str,
    table: str,
    *,
    window: str = "10 seconds",
    watermark: str = "10 seconds",
    queryName: str,
    checkpoint: str,
):
    """START (not drain) the watermarked windowed consumer in APPEND
    mode against a memory sink — the caller interleaves warehouse
    commits with ``processAllAvailable()`` so the watermark actually
    advances BETWEEN micro-batches (that is what makes late-drop and
    append-close observable; a single drained batch can never be
    late).  Returns the StreamingQuery."""
    ev = (
        cdf_feed(spark, root, table)
        .filter(F.col("_change") == "insert")
        .withColumn("ts", F.timestamp_seconds(F.col("size")))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("size").alias("sum_size"),
        )
        .select(
            F.col("window.start").cast("long").alias("win_start"),
            "n_rows",
            "sum_size",
        )
    )
    return (
        ev.writeStream.outputMode("append")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def cdf_two_feed_join(
    spark: SparkSession,
    root: str,
    primary: str,
    replica: str,
    *,
    lag_bound_s: int = 30,
    watermark: str = "60 seconds",
) -> DataFrame:
    """The replica-lag monitor as a STREAM-STREAM inner join: primary
    inserts joined to replica inserts on uid, with the replica's event
    time constrained to [primary, primary + lag_bound].  Both sides
    watermarked, so Spark evicts join state past watermark + bound —
    the state-growth contract the endurance tool measures.  Returns
    the unstarted streaming DataFrame (uid, lag_s)."""
    p = (
        cdf_feed(spark, root, primary)
        .filter(F.col("_change") == "insert")
        .select(
            F.col("uid").alias("p_uid"),
            F.timestamp_seconds(F.col("size")).alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    r = (
        cdf_feed(spark, root, replica)
        .filter(F.col("_change") == "insert")
        .select(
            F.col("uid").alias("r_uid"),
            F.timestamp_seconds(F.col("size")).alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return p.join(
        r,
        (F.col("p_uid") == F.col("r_uid"))
        & (F.col("r_ts") >= F.col("p_ts"))
        & (F.col("r_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {lag_bound_s} SECONDS")),
        "inner",
    ).select(
        F.col("p_uid").alias("uid"),
        (F.col("r_ts").cast("long") - F.col("p_ts").cast("long")).alias("lag_s"),
    )
