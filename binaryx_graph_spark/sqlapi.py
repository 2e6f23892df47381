"""SQL surface over the warehouse (r12): ``Engine.sql("SELECT ...")``.

Spark users speak SQL first; until r12 every lane of this engine was
Python-API only.  This module closes that gap WITHOUT a bespoke parser
or Catalyst extension: the warehouse's tables are registered as session
temp views (plain DataFrame plans — Catalyst sees the same manifest-
resolved, DV-filtered, column-mapped scan the DataFrame lane builds, so
predicate pushdown / column pruning / partition math are inherited, not
re-implemented), plus three pre-pass rewrites for the surface SQL
cannot name natively:

* **Time travel**: ``orders@v12`` / ``orders@ts1700000000`` in the
  query text resolve through :meth:`Warehouse.read` (``VERSION AS OF``
  / ``TIMESTAMP AS OF`` semantics — Delta spells it ``table@v12`` in
  path form too).  The token is rewritten to a generated view name
  bound to that pinned read.
* **Version history**: ``bxg_history(functions)`` is the DESCRIBE
  HISTORY relation — one row per committed version (version / kind /
  n_files / bytes / n_buckets), built driver-side from the manifest
  ledger (bounded by version count, never table rows).
* **Change feed**: ``bxg_changes(functions, 3)``,
  ``bxg_changes(functions, 3, 7)`` and
  ``bxg_changes(functions, 3, 7, images)`` appear where a relation is
  expected (Delta's ``table_changes`` TVF shape) and rewrite to a view
  over :meth:`Warehouse.read_changes` — the same O(changed buckets)
  manifest-diff plan, with ``_change``/``_version`` columns (update
  pre/post images when ``images`` is passed).

Rewrites touch ONLY these three token shapes; everything else is handed
to Spark SQL verbatim (parameter markers included — ``params`` passes
through to ``spark.sql(args=...)``).  ``snapshot=True`` resolves every
base view through the newest CATALOG pin (one consistent multi-table
import, the ``Engine.tables(snapshot=True)`` contract); explicit
``@v``/``@ts`` pins override per table.

Scale note: view registration is metadata-only (lazy plans — no I/O,
no collect); the generated view names are deterministic per (table,
pin) so repeated queries re-bind the same plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

__all__ = ["run_sql", "warehouse_table_names"]

# table@v12 / table@ts1700000000.5 — identifier chars only, so join
# conditions, strings with emails, etc. never match
_TT_VERSION = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)@v(\d+)\b")
_TT_TIMESTAMP = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)@ts(\d+(?:\.\d+)?)\b")
# bxg_changes(table, from[, to[, images]])
_CHANGES = re.compile(
    r"\bbxg_changes\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*(\d+)"
    r"(?:\s*,\s*(\d+))?(?:\s*,\s*(images))?\s*\)",
    re.IGNORECASE,
)
# bxg_history(table) — DESCRIBE HISTORY as a relation
_HISTORY = re.compile(
    r"\bbxg_history\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)", re.IGNORECASE
)


def warehouse_table_names(wh) -> list[str]:
    """Every table present in the warehouse: manifested tables plus
    live directories the manifest protocol hasn't adopted yet."""
    names: set[str] = set()
    md = wh.root / "_manifests"
    if md.exists():
        names.update(p.name for p in md.iterdir() if p.is_dir())
    if wh.root.exists():
        names.update(
            p.name
            for p in wh.root.iterdir()
            if p.is_dir() and not p.name.startswith("_")
        )
    return sorted(names)


def _register(spark: SparkSession, name: str, df: DataFrame) -> None:
    df.createOrReplaceTempView(name)


def run_sql(
    spark: SparkSession,
    wh,
    query: str,
    *,
    snapshot: bool = False,
    params: dict | list | None = None,
) -> DataFrame:
    """Run ``query`` over the warehouse's tables (see module doc)."""
    rewritten = query

    # --- change-feed relations -----------------------------------------
    def _sub_changes(m: re.Match) -> str:
        table, lo, hi, images = m.group(1), int(m.group(2)), m.group(3), m.group(4)
        view = f"bxg_changes_{table}_{lo}_{hi or 'head'}{'_img' if images else ''}"
        kw = {"update_images": True} if images else {}
        if hi is not None:
            df = wh.read_changes(table, lo, int(hi), **kw)
        else:
            df = wh.read_changes(table, lo, **kw)
        _register(spark, view, df)
        return view

    rewritten = _CHANGES.sub(_sub_changes, rewritten)

    # --- version-history relations (DESCRIBE HISTORY shape) --------------
    def _sub_history(m: re.Match) -> str:
        table = m.group(1)
        view = f"bxg_history_{table}"
        rows = wh.history(table)  # bounded by VERSION count, not rows
        df = spark.createDataFrame(
            [
                (
                    int(r["version"]),
                    str(r["kind"]),
                    int(r["n_files"]),
                    int(r["bytes"]),
                    None if r.get("n_buckets") is None else int(r["n_buckets"]),
                )
                for r in rows
            ],
            "version int, kind string, n_files int, bytes long, n_buckets int",
        )
        _register(spark, view, df)
        return view

    rewritten = _HISTORY.sub(_sub_history, rewritten)

    # --- time-travel pins ----------------------------------------------
    def _sub_version(m: re.Match) -> str:
        table, v = m.group(1), int(m.group(2))
        view = f"bxg_tt_{table}_v{v}"
        _register(spark, view, wh.read(table, version=v))
        return view

    def _sub_timestamp(m: re.Match) -> str:
        table, ts = m.group(1), float(m.group(2))
        view = f"bxg_tt_{table}_ts{m.group(2).replace('.', '_')}"
        _register(spark, view, wh.read(table, timestamp=ts))
        return view

    rewritten = _TT_VERSION.sub(_sub_version, rewritten)
    rewritten = _TT_TIMESTAMP.sub(_sub_timestamp, rewritten)

    # --- base views (live heads, or one consistent catalog pin) ---------
    pins = wh.catalog_snapshot() if snapshot else None
    for t in warehouse_table_names(wh):
        if snapshot:
            _register(spark, t, wh.read_snapshot(t, pins))
        else:
            _register(spark, t, wh.read(t))

    if params is not None:
        return spark.sql(rewritten, args=params)
    return spark.sql(rewritten)
