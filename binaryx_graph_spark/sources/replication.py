"""CDC replication: an incremental consumer over the warehouse's
change feed, applying each version's row-level diff to a replica
table EXACTLY ONCE.

This is the composition the r9 feature ring exists for — Delta's
readChangeFeed + idempotent writes, on this manifest:

* :func:`stream_changes` — a polling change-feed consumer with durable
  offsets (one small JSON file, the object-store analog is one tiny
  object per consumer).  Each yielded batch is
  ``read_changes(v0, v1)`` — computed from the MANIFEST DIFF, so a
  consumer of a 100 TB table pays O(changed buckets) per poll, never
  O(table).
* :func:`apply_changes` — applies one batch to a replica warehouse:
  deletions whose keys were not re-inserted become a
  ``delete_where(key IN ...)`` (file-granular on the replica too), and
  inserts MERGE under ``txn=(app, v1)`` — so a crashed-and-replayed
  apply publishes NOTHING (the no-match delete is metadata-free, the
  merge is skipped at the manifest head).
* :func:`replicate` — drain the feed: poll, apply, advance the offset.

The per-batch key list is collected to the driver — bounded by the
BATCH's distinct deleted keys (a CDC batch is O(commit), not O(table));
a full-table re-delete is not a shape this consumer meets, because a
whole-table rewrite arrives as delete+insert pairs whose keys re-insert
and therefore never reach delete_where.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

from .warehouse import MERGE_KEYS, Warehouse


def _read_offset(offset_path: str, table: str) -> int | None:
    p = Path(offset_path)
    if not p.exists():
        return None
    return json.loads(p.read_text()).get(table)


def _write_offset(offset_path: str, table: str, version: int) -> None:
    p = Path(offset_path)
    doc = json.loads(p.read_text()) if p.exists() else {}
    doc[table] = version
    tmp = p.with_suffix(".tmp")
    tmp.write_text(json.dumps(doc, sort_keys=True))
    tmp.replace(p)


def stream_changes(
    src: Warehouse,
    table: str,
    offset_path: str,
    *,
    update_images: bool = False,
):
    """Yield ``(changes_df, v0, v1)`` for every committed version past
    the consumer's durable offset, oldest first — one batch per
    version, so the consumer sees the same intermediate states any
    reader did.  The offset advances ONLY via :func:`_write_offset`
    (callers advance after a successful apply — at-least-once delivery;
    pair with the txn'd apply for exactly-once effect).

    First call on a fresh offset starts at the OLDEST readable
    manifest: the initial snapshot arrives as that version's inserts
    (read_changes against an empty base is exactly the full content)."""
    versions = src._manifest_versions(table)
    if not versions:
        return
    seen = _read_offset(offset_path, table)
    for v in versions:
        if seen is not None and v <= seen:
            continue
        if seen is None:
            # initial snapshot: everything in v, as inserts
            full = src.read(table, version=v)
            yield full.withColumn("_change", F.lit("insert")), None, v
        else:
            yield src.read_changes(
                table, seen, v, update_images=update_images
            ), seen, v
        seen = v


def apply_changes(
    dst: Warehouse,
    table: str,
    changes: DataFrame,
    version: int,
    *,
    app: str = "cdc_replication",
) -> None:
    """Apply one change batch to the replica, exactly once.

    True deletions = keys with a delete row and NO insert row in the
    batch (an LWW update's delete+insert pair must not delete).  Only
    single-column-key tables support the delete arm (delete_where
    predicates are per-column conjuncts); multi-column-key tables with
    actual key deletions raise rather than silently diverge.

    Feeds carrying Delta CDF change types (``update_images=True``
    upstream) apply natively: ``update_postimage`` rows merge like
    inserts, ``update_preimage`` rows are dropped (their key's new
    image supersedes them), and the delete arm sees only PLAIN deletes
    — no pair-detection heuristic needed, the labels carry it."""
    keys = MERGE_KEYS[table]
    ins = changes.filter(
        F.col("_change").isin("insert", "update_postimage")
    ).drop("_change")
    dels = changes.filter(F.col("_change") == "delete").drop("_change")
    gone = (
        dels.select(*keys).distinct().exceptAll(ins.select(*keys).distinct())
    )
    gone_rows = gone.collect()  # bounded by the BATCH's deleted keys
    if gone_rows:
        if len(keys) != 1:
            raise ValueError(
                f"table '{table}': replicating key deletions needs a "
                f"single-column merge key (got {keys}) — express the purge "
                f"on the replica directly"
            )
        dst.delete_where(table, [(keys[0], "in", [r[keys[0]] for r in gone_rows])])
    # inserts (including the insert half of updates) MERGE last-write-
    # wins; txn pins this source version — a replayed apply is skipped
    # at the replica's manifest head with zero writes
    dst.merge_batch_incremental({table: ins}, batch_seq=version + 1, txn=(app, version))


def replicate(
    src: Warehouse,
    dst: Warehouse,
    table: str,
    offset_path: str,
    *,
    app: str = "cdc_replication",
    register: bool = True,
    update_images: bool = False,
) -> list[int]:
    """Drain the change feed into the replica (availableNow semantics):
    apply every unconsumed version in order, advancing the durable
    offset after each successful apply.  Returns the versions applied.
    Crash-safe at every boundary: a crash before the offset write
    re-applies the batch on restart, and the txn'd apply makes that
    re-apply a zero-write no-op.

    ``register`` (default on) mirrors the offset into the SOURCE
    warehouse (`Warehouse.register_consumer`), so its vacuum retains
    every manifest this consumer still needs — the retention guard
    that turns "a vacuumed manifest in the range raises" from a
    documented failure mode into a non-event."""
    applied = []
    for changes, _v0, v1 in stream_changes(
        src, table, offset_path, update_images=update_images
    ):
        apply_changes(dst, table, changes, v1, app=app)
        _write_offset(offset_path, table, v1)
        if register:
            src.register_consumer(app, table, v1)
        applied.append(v1)
    return applied
