"""Measure the rebucket lever's payoff: write volume per commit
before/after re-layout (r9; closes the loop on SCALE.md addendum 42's
cost law).

The incremental commit writes O(|batch| + k·table/B) bytes (k touched
buckets of table/B each).  A table that grew past its birth-time B pays
the table/B term on every commit; `rebucket` shrinks it.  This tool
builds a table at a deliberately undersized B_small, commits a fixed
single-key batch R times measuring bytes ADDED per commit (manifest
diff × file stat — the exact write volume, not wall time, per the
addendum-42 finding that wall is harness-dominated at gate scale),
then `rebucket(B_big)` and repeats the SAME batches.  Expected ratio ≈
B_big/B_small on the table/B term.

Prints one JSON line.

Usage: python -m tools.measure_rebucket_volume [n_rows] [B_small] [B_big]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    b_small = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    b_big = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rounds = 6

    from pyspark.sql import SparkSession

    from binaryx_graph_spark.sources.warehouse import Warehouse

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("measure-rebucket-volume")
        .getOrCreate()
    )
    root = os.path.join(tempfile.gettempdir(), "bxg_rebucket_volume")
    shutil.rmtree(root, ignore_errors=True)
    wh = Warehouse(spark, root)

    def fns(rows):
        return spark.createDataFrame(
            [(str(k), f"fn_{k}", "", int(v), "Internal") for k, v in rows],
            "uid string, name string, address string, size long, type string",
        )

    base = spark.range(n_rows).selectExpr(
        "cast(id as string) as uid",
        "concat('fn_', id) as name",
        "'' as address",
        "id % 997 as size",
        "'Internal' as type",
    )
    wh.merge_batch_incremental({"functions": base}, batch_seq=0, n_buckets=b_small)

    def added_bytes(v_prev: int, v_new: int) -> int:
        mp, mn = wh._manifest("functions", v_prev), wh._manifest("functions", v_new)
        prev_files = {
            f"{b}/{fn}" for b, fs in mp["buckets"].items() for fn in fs
        }
        total = 0
        for b, fs in mn["buckets"].items():
            for fn in fs:
                if f"{b}/{fn}" not in prev_files:
                    p = wh.root / "functions" / f"_kb={b}" / fn
                    total += p.stat().st_size
        return total

    def commit_round(tag: str) -> list[int]:
        out = []
        for j in range(rounds):
            v0 = wh.versions("functions")[-1]
            wh.merge_batch_incremental(
                {"functions": fns([(j * 1000 + 17, j)])}, batch_seq=j + 1
            )
            out.append(added_bytes(v0, wh.versions("functions")[-1]))
        return out

    small = commit_round("small")
    v_before = wh.versions("functions")[-1]
    wh.rebucket("functions", b_big)
    big = commit_round("big")

    # exactness across the whole exercise: count + checksum stable keys
    live = wh.read("functions")
    n_live = live.count()

    med_small = sorted(small)[len(small) // 2]
    med_big = sorted(big)[len(big) // 2]
    out = {
        "n_rows": n_rows,
        "b_small": b_small,
        "b_big": b_big,
        "bytes_per_commit_small_B": small,
        "bytes_per_commit_big_B": big,
        "median_small": med_small,
        "median_big": med_big,
        "volume_ratio_small_over_big": round(med_small / max(med_big, 1), 2),
        "expected_ratio_approx": round(b_big / b_small, 2),
        "live_rows": n_live,
        "time_travel_pre_rebucket_rows": wh.read("functions", version=v_before).count(),
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
