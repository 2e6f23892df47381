"""Streaming MERGE INTO sink — the canonical lakehouse CDC-apply
pattern (Delta's ``foreachBatch`` + ``MERGE`` idiom), on this engine:

``warehouse_cdf`` feed (WITH update images) → ``foreachBatch`` →
:meth:`Warehouse.merge_into` per source version, under txn idempotency.

Why this shape:

* **The feed carries intent**: with ``updateImages`` on, a mutation
  arrives as its postimage (one upsert), a true deletion as a plain
  delete — so apply needs no pair-detection heuristic and maps 1:1
  onto MERGE INTO's arms (postimage/insert → update+insert arms,
  delete → delete arm).
* **Exactly-once twice over**: Structured Streaming's checkpoint
  guarantees each source version is DELIVERED once per successful
  epoch, and the per-version ``txn=(app, version)`` keys make the
  APPLY idempotent — a crashed-and-replayed micro-batch re-runs its
  merges as zero-write no-ops (the same contract the bespoke polling
  consumer `sources/replication.py` has; this sink replaces it with
  the stock pattern any Delta user already knows).
* **Scale shape**: the feed plans one InputPartition per changed
  bucket per version (untouched buckets never open); each apply is a
  MOR MERGE INTO that tombstones/append-writes O(changed rows) on the
  replica.  Replica maintenance runs UNATTENDED when
  ``auto_maintenance`` is set: after each applied micro-batch the sink
  calls :meth:`Warehouse.auto_maintain` — version arithmetic gates a
  metadata-only debt check every k replica commits, the O(table) DV
  purge fires only past the thresholds, and the txn map rides every
  manifest so a fire never breaks replay idempotency.  A long-running
  replica keeps flat scan time with zero operator intervention
  (``tools/endurance_replication.py --auto-maintain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cdf_stream import register_warehouse_cdf_datasource
from ..sources.warehouse import MERGE_KEYS, Warehouse


def apply_changes_merge_into(
    dst: Warehouse,
    table: str,
    batch_df: DataFrame,
    *,
    app: str = "cdf_merge_apply",
    auto_maintenance: int | None = None,
) -> dict:
    """Apply one CDC micro-batch (rows + ``_change`` + ``_version``,
    image labels) to the replica via MERGE INTO — one version at a
    time, in order, each under its own ``txn=(app, version)`` key so a
    replayed batch publishes nothing.  Returns {version: merge stats}.

    Within one version the arms commute: update images target existing
    keys, inserts target fresh keys, plain deletes target keys with no
    new image (the feed's labels guarantee disjointness), so the two
    merges per version (upsert arm, delete arm) are order-safe.

    ``auto_maintenance=k`` runs the replica's unattended maintenance
    cadence after the batch (:meth:`Warehouse.auto_maintain`, checked
    every ``k`` replica commits); when the policy fires, the result
    lands under the ``"maintenance"`` key."""
    keys = MERGE_KEYS[table]
    out: dict[int, dict] = {}
    versions = sorted(
        r["_version"]
        for r in batch_df.select("_version").distinct().collect()
    )  # bounded by the batch's commit count, never row count
    for v in versions:
        b = batch_df.filter(F.col("_version") == v)
        stats = {"rows_updated": 0, "rows_deleted": 0, "rows_inserted": 0}
        ups = b.filter(
            F.col("_change").isin("insert", "update_postimage")
        ).drop("_change", "_version")
        if not ups.isEmpty():
            d = dst.merge_into(
                table,
                ups,
                when_matched_update="all",
                when_not_matched_insert=True,
                txn=(f"{app}:upsert", v),
            )
            stats["rows_updated"] += d["rows_updated"]
            stats["rows_inserted"] += d["rows_inserted"]
        dels = (
            b.filter(F.col("_change") == "delete")
            .select(*keys)
            .dropDuplicates()
        )
        if not dels.isEmpty():
            d = dst.merge_into(
                table,
                dels,
                when_matched_delete=True,
                when_not_matched_insert=False,
                txn=(f"{app}:delete", v),
            )
            stats["rows_deleted"] += d["rows_deleted"]
        out[v] = stats
    if auto_maintenance:
        maint = dst.auto_maintain(table, every_k_commits=auto_maintenance)
        if maint is not None:
            out["maintenance"] = maint
    return out


def cdf_merge_into_apply(
    spark: SparkSession,
    src_root: str,
    table: str,
    dst_root: str,
    *,
    checkpoint: str,
    app: str = "cdf_merge_apply",
    auto_maintenance: int | None = None,
) -> None:
    """Drain the source table's change feed into a replica warehouse
    (availableNow semantics): one structured-streaming run whose
    ``foreachBatch`` applies each version via MERGE INTO.  Restarting
    with the same ``checkpoint`` resumes from the consumed offset;
    re-delivered versions replay as zero-write no-ops (txn keys).
    ``auto_maintenance=k`` bounds the replica's merge-on-read debt
    unattended (post-batch :meth:`Warehouse.auto_maintain` cadence)."""
    register_warehouse_cdf_datasource(spark)
    dst = Warehouse(spark, dst_root)
    feed = (
        spark.readStream.format("warehouse_cdf")
        .option("root", src_root)
        .option("table", table)
        .option("updateImages", "true")
        .load()
    )
    (
        feed.writeStream.foreachBatch(
            lambda df, _bid: apply_changes_merge_into(
                dst, table, df, app=app, auto_maintenance=auto_maintenance
            )
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
