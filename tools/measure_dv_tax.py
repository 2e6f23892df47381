"""Measure the MERGE-ON-READ read tax: full-scan latency as deletion-
vector sidecars stack on a table, and its reset after compaction
purges them.

The DV design trades write-amp (O(deleted rows) per delete) for a
read-side anti-join against the accumulated tombstones.  This tool
prices that trade so the compaction cadence is a measured decision,
not a vibe: scan the table after 0, 1, 2, 4, 8, 16 stacked DV commits,
then after ``optimize`` (purge), reporting median wall seconds per
scan and the tombstone-byte total.

Usage: python -m tools.measure_dv_tax [rows] [waves]
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


def main(rows: int = 500_000, waves: int = 16) -> None:
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
    wh = Warehouse(spark, tempfile.mkdtemp(prefix="bxg_dvtax_"))
    df = spark.range(rows).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )
    wh.merge_batch_incremental({"functions": df}, n_buckets=16)

    out: dict = {"rows": rows, "scans": {}, "dv_bytes_total": 0}
    out["scans"]["0_dvs"] = _median_scan(wh, "functions")
    checkpoints = {1, 2, 4, 8, 16}
    span = rows // (waves * 200)  # 0.5% of rows per delete wave
    for w in range(1, waves + 1):
        lo = (w - 1) * span
        d = wh.delete_where_dv(
            "functions", [("size", "between", (lo, lo + span - 1))]
        )
        out["dv_bytes_total"] += d["dv_bytes"]
        if w in checkpoints:
            out["scans"][f"{w}_dvs"] = _median_scan(wh, "functions")
    n_before = wh.read("functions").count()
    t0 = time.time()
    wh.optimize(target_bytes=1 << 28)
    out["purge_sec"] = round(time.time() - t0, 2)
    out["scans"]["after_purge"] = _median_scan(wh, "functions")
    assert wh.read("functions").count() == n_before
    m = wh._manifest("functions", wh.versions("functions")[-1])
    assert not m.get("dvs")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 500_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 16,
    )
