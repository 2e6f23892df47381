"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every setting is
chosen so the same code works on a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy)
- shuffle partitions sized for the local core count (cluster deployments
  override via ``spark.sql.shuffle.partitions``; AQE coalesces down)
- session timezone pinned to UTC so results are environment-independent
  (and comparable against the DuckDB oracle, which is UTC-naive)
- ``nanosAsLong`` because the test parquet stores TIMESTAMP(NANOS),
  which vanilla Spark refuses to read; :mod:`.model` converts back.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "binaryx-graph-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-targeted post-shuffle partitions (advisory bytes), not
        # core-count-padded ones: with parallelismFirst (the default)
        # AQE coalesces only down to default parallelism, leaving tiny
        # shuffles split into N near-empty tasks at EVERY scale — the
        # optimization guide's §2.2 "fewer, larger reduce partitions".
        # Interleaved A/B over the 45-query headline at sf0.1: 72.3 s →
        # 63.2 s min-total, no per-query regression > 0.12 s.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local[N] runs everything in the driver JVM.  An 8g-vs-24g
        # bench A/B was inconclusive (host-level noise dominated:
        # back-to-back identical-config runs varied 28-36s); keeping the
        # r3-baseline 8g — override via SPARK_GRAFT_DRIVER_MEM when a
        # workload genuinely needs more heap
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # managed (bucketed) tables land outside the repo; static conf
        .config("spark.sql.warehouse.dir", os.environ.get("BXG_SPARK_WAREHOUSE", "/tmp/bxg_spark_warehouse"))
    )
    return builder.getOrCreate()


def tune_for_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-provided
    session (the driver passes its own SparkSession to ``entry``)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"
        )
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; loader copes either way
    return spark
