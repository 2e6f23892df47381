"""Distributed dense ranking without a single-partition window.

The naive ``dense_rank().over(Window.orderBy(col))`` funnels every row
through one task — fine for a handful of rows, a serial wall at
millions (the r7-verdict residual on ``ingest_seq``).  The two-level
scan here is the same shape as the sharded sequence packer
(operators/textstats.pack_chunks): rank within range-shards in
parallel, then offset by a prefix sum over the per-shard COUNTS — the
only single-partition step is over ``n_shards`` rows of shard
metadata, never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dense_rank_sharded(
    distinct_values: DataFrame, col: str, out: str, *, n_shards: int | None = None
) -> DataFrame:
    """1-based rank of the rows of ``distinct_values`` by ``col``
    (callers pass DISTINCT values, so dense_rank == row_number) →
    (col, out).

    Sharding: ``repartitionByRange`` samples range boundaries and
    assigns ASCENDING ranges to ascending partition ids, so
    ``spark_partition_id()`` is a monotone shard key — no quantile
    probe pass needed (and unlike numeric percentile boundaries this
    works for string keys).  AQE may coalesce adjacent ranges; adjacency
    preserves monotonicity.  Exactness does not depend on balance."""
    spark = distinct_values.sparkSession
    if n_shards is None:
        n_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    v = distinct_values.repartitionByRange(max(n_shards, 1), F.col(col)).withColumn(
        "_shard", F.spark_partition_id()
    )
    # two consumers below (ranks + offsets) MUST see one materialized
    # sharding — recomputing the range exchange per consumer would let
    # the planner assign shards twice (one small frame: names only)
    v = v.localCheckpoint(eager=True)
    w_in = Window.partitionBy("_shard").orderBy(col)
    w_sh = Window.orderBy("_shard").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        v.groupBy("_shard")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_off", F.coalesce(F.sum("_c").over(w_sh), F.lit(0)))
        .select("_shard", "_off")
    )
    return (
        v.withColumn("_r", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "_shard")
        .select(col, (F.col("_r") + F.col("_off")).cast("int").alias(out))
    )
