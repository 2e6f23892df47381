"""Measure the data-skipping stack's payoff in BYTES NOT READ (r9
session 2): zone maps on a clustered layout, z-order on two dimensions,
bloom point probes, key-bucket point lookups, and file-granular delete
rewrite volume.

Wall time at gate scale is harness-dominated (SCALE.md addendum 42), so
this measures the scale-true axes: files opened and bytes opened, both
straight from the manifest the scan decided on — the exact I/O a 1000-
executor cluster would issue.  Each scenario also verifies the scan
equals read().filter row-for-row before reporting, so every number
comes from a CORRECT plan.

Prints one JSON line.

Usage: python -m tools.measure_skipping [n_rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.session import get_spark  # noqa: E402
from binaryx_graph_spark.sources.warehouse import Warehouse  # noqa: E402


def _bytes_of(wh, table, rel_names):
    m = wh._manifest(table, wh.versions(table)[-1])
    return sum(m["bytes"][r] for r in rel_names)


def _scan_cost(wh, table, preds):
    """(files_read, files_total, bytes_read, bytes_total) + exactness."""
    m = wh._manifest(table, wh.versions(table)[-1])
    kept, total = wh._prune_rels(table, m, preds)
    kept_rels = [r for r, _p in kept]
    bytes_read = sum(m["bytes"][r] for r in kept_rels)
    bytes_total = sum(m["bytes"].values())
    got = wh.scan(table, preds).count()
    exp = Warehouse._apply_predicates(wh.read(table), preds).count()
    assert got == exp, f"scan diverged for {preds}: {got} != {exp}"
    return {
        "files": [len(kept), total],
        "bytes": [bytes_read, bytes_total],
        "rows": got,
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark("measure-skipping")
    root = os.path.join(tempfile.gettempdir(), "bxg_measure_skipping")
    shutil.rmtree(root, ignore_errors=True)
    out = {"n_rows": n}

    df = spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.md5(F.col("id").cast("string")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )

    # --- A: flat + range-clustered: zone-map range scan -----------------
    wh = Warehouse(spark, root)
    wh.merge_batch({"functions": df})
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    target = max(4096, sum(m0["bytes"].values()) // 32)  # ~32 files
    wh.optimize(target_bytes=target, cluster_by={"functions": ["size"]})
    out["clustered_range_1pct"] = _scan_cost(
        wh, "functions", [("size", "between", (n // 2, n // 2 + n // 100))]
    )
    out["unclustered_control"] = None  # zone maps on key-hashed layout:
    # every file spans ~the full size domain — measured below via bucketed

    # --- B: bucketed + bloom: point probes -------------------------------
    shutil.rmtree(root, ignore_errors=True)
    whb = Warehouse(spark, root, bloom_columns={"functions": ["name"]})
    whb.merge_batch_incremental({"functions": df})
    probe = spark.sql(f"SELECT md5('{n // 3}') AS h").collect()[0]["h"]
    out["bucketed_range_control"] = _scan_cost(
        whb, "functions", [("size", "between", (n // 2, n // 2 + n // 100))]
    )
    out["bloom_point_hit"] = _scan_cost(whb, "functions", [("name", "=", probe)])
    out["bloom_point_absent"] = _scan_cost(
        whb, "functions", [("name", "=", "nope_not_here")]
    )
    out["key_bucket_lookup"] = _scan_cost(
        whb, "functions", [("uid", "=", str(n // 3))]
    )
    bdir = os.path.join(root, "_blooms", "functions")
    out["bloom_sidecar_bytes_total"] = sum(
        os.path.getsize(os.path.join(bdir, f)) for f in os.listdir(bdir)
    )

    # --- C: z-order: both dimensions prune --------------------------------
    shutil.rmtree(root, ignore_errors=True)
    whz = Warehouse(spark, root)
    df2 = df.withColumn("size2", ((F.col("size") * 7919) % 1_000_000).cast("long"))
    whz.merge_batch({"functions": df2}, allow_new_columns=True)
    m0 = whz._manifest("functions", whz.versions("functions")[-1])
    target = max(4096, sum(m0["bytes"].values()) // 32)
    whz.optimize(
        target_bytes=target, cluster_by={"functions": {"zorder": ["size", "size2"]}}
    )
    out["zorder_dim1_10pct"] = _scan_cost(
        whz, "functions", [("size", "between", (0, n // 10))]
    )
    out["zorder_dim2_10pct"] = _scan_cost(
        whz, "functions", [("size2", "between", (0, 100_000))]
    )

    # --- D: delete rewrite volume -----------------------------------------
    pre = whz._manifest("functions", whz.versions("functions")[-1])
    pre_files = set(pre["files"])
    d = whz.delete_where("functions", [("size", "between", (0, n // 100))])
    post = whz._manifest("functions", whz.versions("functions")[-1])
    written = sum(
        post["bytes"][r] for r in set(post["files"]) - pre_files
    )
    out["delete_1pct"] = {
        "files_rewritten": [d["files_rewritten"], d["files_total"]],
        "rows_deleted": d["rows_deleted"],
        "bytes_written": written,
        "bytes_table": sum(pre["bytes"].values()),
    }

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
