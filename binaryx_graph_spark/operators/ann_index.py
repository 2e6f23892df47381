"""Incremental IVF index maintenance on the warehouse.

At 100 TB you cannot rebuild an ANN index per commit.  This module
keeps the IVF assignment table fresh under DML the way Delta keeps a
materialized view fresh: by consuming the CHANGE FEED, not the corpus.

Design (reference has no vector surface; this extends the engine's
ANN family — SURVEY.md §6 — with the index-freshness lever the r10
review named):

* **Assignments are a warehouse table** (``_ivf_assignments``, keyed
  ``(corpus, vec_id)``): one row per indexed vector carrying its
  ``centroid_id`` (the inverted-list id) and the vector itself
  (denormalized for scoring, exactly like a parquet inverted-list
  layout).  Being a keyed table buys the whole manifest story: LWW
  merge, DV delete, time travel, vacuum, cluster-by compaction.
* **Freshness state is a model-store row** (``ivf_state:<corpus>``)
  recording the source-table version the index reflects, content-keyed
  by the CODEBOOK identity — swapping the codebook invalidates the
  state and forces a full rebuild (assignments from two codebooks must
  never mix).
* **Refresh is O(changed rows)**: :func:`ivf_index_refresh` reads
  ``read_changes(from=state, to=head, update_images=True)`` —
  postimages and inserts are re-assigned and LWW-merged (an updated
  vector MOVES to its new list atomically, because the merge key is
  the vec id), plain deletes are DV-tombstoned out of the index.  The
  corpus itself is never rescanned.
* **Probes prune**: :func:`cosine_topk_ivf_index` selects probe lists
  driver-side (k·dim codebook math) and scans the assignment table
  with ``centroid_id IN probes`` — after a
  ``optimize(cluster_by={'_ivf_assignments': ['centroid_id']})`` the
  zone maps turn that into file-level pruning, the manifest-native
  analog of partition-directory pruning.

Certified by ``ann_ivf_incremental_certified``: after mixed
insert/update/delete commits, the incrementally-maintained assignments
are IDENTICAL to a full rebuild, and an all-lists probe over the index
equals the brute-force oracle over the live table.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.model_store import ModelStore
from ..sources.warehouse import Warehouse
from .similarity import _lit_vec, _py_cosine, _py_sqrt_norm, dot, ivf_assign, norm_sq

INDEX_TABLE = "_ivf_assignments"


def _codebook_key(codebook: dict[int, list[float]]) -> str:
    """Content address of a trained codebook — binds the index state to
    the exact centroids it was assigned against."""
    blob = json.dumps(
        {int(k): [float(x) for x in v] for k, v in codebook.items()},
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:24]


def _assignments_df(
    df: DataFrame, corpus: str, codebook, id_col: str, vec_col: str
) -> DataFrame:
    return ivf_assign(df, codebook, id_col=id_col, vec_col=vec_col).select(
        F.lit(corpus).alias("corpus"),
        F.col(id_col).cast("long").alias("vec_id"),
        F.col("centroid_id").cast("int").alias("centroid_id"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
    )


def ivf_index_refresh(
    wh: Warehouse,
    table: str,
    corpus: str,
    codebook: dict[int, list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    store: ModelStore | None = None,
) -> dict:
    """Bring the corpus's IVF assignments up to the source table's head
    version — FULL build on first touch (or codebook change), else an
    incremental refresh that reads only the change feed.

    Returns ``{'mode': 'full'|'incremental'|'noop', 'rows_assigned',
    'rows_removed', 'version'}``."""
    if store is None:
        store = ModelStore(wh.spark, str(wh.root))
    head = (wh.versions(table) or [None])[-1]
    if head is None:
        raise ValueError(f"ivf_index_refresh: source table '{table}' is empty")
    ck = _codebook_key(codebook)
    state_name = f"ivf_state:{corpus}"
    state = store.get(state_name, content_key=ck)

    if state is not None and state["version"] == head:
        return {
            "mode": "noop", "rows_assigned": 0, "rows_removed": 0,
            "version": head,
        }

    if state is None:
        # full (re)build: clear any stale corpus rows (a codebook swap
        # leaves assignments from the OLD centroids), then assign all
        try:
            wh.delete_where(INDEX_TABLE, [("corpus", "=", corpus)])
        except FileNotFoundError:
            pass
        src = wh.read(table, version=head)
        out = _assignments_df(src, corpus, codebook, id_col, vec_col)
        n = out.count()
        wh.merge_batch_incremental({INDEX_TABLE: out})
        store.put(
            state_name, {"version": head}, kind="ivf_state", content_key=ck
        )
        return {
            "mode": "full", "rows_assigned": int(n), "rows_removed": 0,
            "version": head,
        }

    # incremental: the change feed names exactly the rows to touch
    ch = wh.read_changes(
        table, state["version"], head, update_images=True
    ).localCheckpoint(eager=True)
    upserts = ch.filter(
        F.col("_change").isin("insert", "update_postimage")
    ).drop("_change")
    dead_ids = [
        r[id_col]
        for r in ch.filter(F.col("_change") == "delete")
        .select(id_col)
        .collect()  # bounded by the BATCH's deletes, never the corpus
    ]
    n_up = upserts.count()
    if n_up:
        out = _assignments_df(upserts, corpus, codebook, id_col, vec_col)
        wh.merge_batch_incremental({INDEX_TABLE: out})
    if dead_ids:
        wh.delete_where_dv(
            INDEX_TABLE,
            [("corpus", "=", corpus), ("vec_id", "in", dead_ids)],
        )
    store.put(state_name, {"version": head}, kind="ivf_state", content_key=ck)
    return {
        "mode": "incremental",
        "rows_assigned": int(n_up),
        "rows_removed": len(dead_ids),
        "version": head,
    }


def ivf_index_assignments(wh: Warehouse, corpus: str) -> DataFrame:
    """The corpus's live (vec_id, centroid_id) map — the equality
    surface the certifier compares against a full rebuild."""
    return (
        wh.read(INDEX_TABLE)
        .filter(F.col("corpus") == corpus)
        .select("vec_id", "centroid_id")
    )


def cosine_topk_ivf_index(
    wh: Warehouse,
    corpus: str,
    codebook: dict[int, list[float]],
    query_vec: list[float],
    *,
    k: int = 10,
    n_probe: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF probe against the MAINTAINED index: probe lists chosen
    driver-side (k·dim codebook math), then one pruned scan of the
    assignment table — ``corpus = X AND centroid_id IN probes`` rides
    the zone maps after a cluster-by-centroid compaction.  Returns
    (vec_id, cos_sim) top-k, ties broken on id, the same scoring fold
    as every other ANN lane (bit-reproducible vs the SQL oracle)."""
    qv = [float(x) for x in query_vec]
    qn = _py_sqrt_norm(qv)
    scored = sorted(((-_py_cosine(qv, qn, c), cid) for cid, c in codebook.items()))
    probe_ids = [cid for _negcos, cid in scored[:n_probe]]
    lit_q = _lit_vec(qv)  # one parse, not dim py4j round-trips
    lists = wh.scan(
        INDEX_TABLE,
        [("corpus", "=", corpus), ("centroid_id", "in", probe_ids)],
    )
    if exclude_id is not None:
        lists = lists.filter(F.col("vec_id") != exclude_id)
    return (
        lists.select(
            "vec_id",
            (
                dot(F.col("embedding"), lit_q)
                / (F.sqrt(norm_sq(F.col("embedding"))) * F.lit(qn))
            )
            .cast("double")
            .alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )
