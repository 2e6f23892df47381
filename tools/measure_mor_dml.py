"""Measure the r11 MERGE-ON-READ DML write volumes and the
auto-compaction policy's scan-time recovery.

Three experiments on a 500k-row bucketed table:

1. **Point UPDATE write-amp** — the same k-row update through
   ``update_where`` (copy-on-write: rewrites every candidate file) and
   ``update_where_dv`` (DV-tombstone + append): bytes written by each
   commit.  This is the UPDATE twin of addendum 54's delete numbers.
2. **MERGE INTO write-amp** — the same k-row matched-update merge
   through ``strategy='cow'`` (rewrites every touched bucket) and
   ``strategy='mor'``: new bytes each commit adds.
3. **Auto-compaction recovery** — median full-scan seconds on the
   clean table, after the DV debt the two MOR experiments built, and
   after ``maybe_optimize`` fires and purges — the policy's measured
   payoff (the ``dv_file_fraction`` trigger is the one that fires).

Usage: python -m tools.measure_mor_dml [rows] [k]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def _median_scan(wh, table: str, runs: int = 5) -> float:
    ts = []
    for _ in range(runs):
        t0 = time.time()
        wh.read(table).agg(F.count(F.lit(1)), F.sum("size")).collect()
        ts.append(time.time() - t0)
    ts.sort()
    return round(ts[len(ts) // 2], 4)


def _bytes_of(wh, table: str) -> dict[str, int]:
    m = wh._manifest(table, wh.versions(table)[-1])
    return dict(m.get("bytes", {}))


def _new_bytes(before: dict, after: dict, wh, table: str) -> int:
    data = sum(b for rel, b in after.items() if rel not in before)
    dvs = sum(
        f.stat().st_size for f in wh._dv_dir(table).glob("dv-*.parquet")
    )
    return data + dvs


def main(rows: int = 500_000, k: int = 1_000) -> None:
    from binaryx_graph_spark.sources.warehouse import Warehouse

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]"
        )
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def fns():
        return spark.range(rows).select(
            F.col("id").cast("string").alias("uid"),
            F.concat(F.lit("fn_"), F.col("id")).alias("name"),
            F.lit("").alias("address"),
            F.col("id").cast("long").alias("size"),
            F.lit("Internal").alias("type"),
        )

    preds = [("size", "between", (1000, 1000 + k - 1))]
    assigns = {"size": F.col("size") + 10_000_000}
    out: dict = {"rows": rows, "k": k}

    # 1. UPDATE: CoW vs MOR
    cow = Warehouse(spark, tempfile.mkdtemp(prefix="bxg_morU_cow_"))
    cow.merge_batch_incremental({"functions": fns()}, n_buckets=16)
    b0 = _bytes_of(cow, "functions")
    t0 = time.time()
    cow.update_where("functions", preds, assigns)
    out["update_cow_sec"] = round(time.time() - t0, 3)
    out["update_cow_bytes"] = _new_bytes(b0, _bytes_of(cow, "functions"), cow, "functions")

    mor = Warehouse(spark, tempfile.mkdtemp(prefix="bxg_morU_mor_"))
    mor.merge_batch_incremental({"functions": fns()}, n_buckets=16)
    b0 = _bytes_of(mor, "functions")
    t0 = time.time()
    d = mor.update_where_dv("functions", preds, assigns)
    out["update_mor_sec"] = round(time.time() - t0, 3)
    out["update_mor_bytes"] = d["dv_bytes"] + d["appended_bytes"]

    # 2. MERGE INTO matched arm: CoW vs MOR
    src = spark.range(k).select(
        (F.col("id") + rows // 2).cast("string").alias("uid"),
        (F.col("id") + 20_000_000).cast("long").alias("new_size"),
    )
    for label, strat in (("merge_cow", "cow"), ("merge_mor", "mor")):
        w = Warehouse(spark, tempfile.mkdtemp(prefix=f"bxg_morM_{strat}_"))
        w.merge_batch_incremental({"functions": fns()}, n_buckets=16)
        b0 = _bytes_of(w, "functions")
        t0 = time.time()
        w.merge_into(
            "functions", src,
            when_matched_update={"size": F.col("s.new_size")},
            when_not_matched_insert=False,
            strategy=strat,
        )
        out[f"{label}_sec"] = round(time.time() - t0, 3)
        out[f"{label}_bytes"] = _new_bytes(b0, _bytes_of(w, "functions"), w, "functions")

    # 3. auto-compaction recovery on the MOR-update warehouse
    out["scan_clean_sec"] = _median_scan(cow, "functions")
    # stack more debt: spread deletes so many files carry DVs
    mor.delete_where_dv("functions", [("size", "between", (50_000, 54_999))])
    stats = mor.dv_stats("functions")
    out["debt_files_dvd"] = stats["files_dvd"]
    out["debt_tombstones"] = stats["tombstone_rows"]
    out["scan_with_debt_sec"] = _median_scan(mor, "functions")
    t0 = time.time()
    fired = mor.maybe_optimize("functions", dv_file_fraction=0.2)
    out["auto_optimize_sec"] = round(time.time() - t0, 3)
    out["auto_optimize_triggers"] = fired["triggers"] if fired else []
    out["scan_after_purge_sec"] = _median_scan(mor, "functions")
    out["post_purge_debt"] = mor.dv_stats("functions")["tombstone_rows"]

    print(json.dumps(out, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 500_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 1_000,
    )
