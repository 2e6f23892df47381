"""Endurance probe for the CDC replication pipeline (r9 session 2):
a replica consumer polling behind a long incremental-commit stream.

The scale question: does an incremental consumer's PER-POLL cost track
the COMMIT size (O(changed buckets)) or the TABLE size (O(table))?  A
consumer that re-reads the table every poll melts at 100 TB; the
manifest-diff feed must keep per-poll bytes flat as the table grows.

Shape: W waves; each wave commits K single-key batches to the source
(table grows monotonically), then the consumer drains the feed into
the replica.  Per wave we record: source table bytes, bytes the
consumer's read_changes actually LISTED (manifest-diff priced — the
sum of changed buckets' file bytes across both versions), replica ==
source equality (exceptAll both ways), and replica version count.
Ends with a crash-replay check (offset rewound one version → zero new
replica versions).

Prints one JSON line.

The probe takes the bucket count as its third arg because the answer
DEPENDS on it: a batch of k random keys touches ~min(k, B) buckets, so
per-transition feed bytes ≈ 2·min(k,B)/B · table — at B=64 a 37-key
commit diffs half the table, at B=512 an eighth.  The feed's pricing
law is the SAME B ∝ table-size rule as the commit path (SCALE.md
addendum 42): size B so a bucket ≈ a batch, and both the commit and
its CDC consumer pay O(batch).

Usage: python -m tools.endurance_replication [waves] [commits_per_wave] [n_buckets]
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
from binaryx_graph_spark.sources.replication import (  # noqa: E402
    _write_offset,
    replicate,
)
from binaryx_graph_spark.sources.warehouse import Warehouse  # noqa: E402


def _changed_bytes(wh: Warehouse, table: str, v0: int, v1: int) -> int:
    """Bytes the manifest-diff feed lists for (v0, v1] — both sides of
    every changed bucket, summed over each intermediate transition
    (exactly what stream_changes reads)."""
    total = 0
    versions = [v for v in wh._manifest_versions(table) if v0 <= v <= v1]
    for a, b in zip(versions, versions[1:]):
        ma, mb = wh._manifest(table, a), wh._manifest(table, b)
        if "buckets" not in ma or "buckets" not in mb:
            total += sum(ma.get("bytes", {}).values()) + sum(
                mb.get("bytes", {}).values()
            )
            continue
        for kb in set(ma["buckets"]) | set(mb["buckets"]):
            if ma["buckets"].get(kb) != mb["buckets"].get(kb):
                for m, side in ((ma, "a"), (mb, "b")):
                    for fn in m["buckets"].get(kb, []):
                        total += m["bytes"].get(f"{kb}/{fn}", 0)
    return total


def main() -> None:
    waves = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per_wave = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark("endurance-replication")
    root = os.path.join(tempfile.gettempdir(), "bxg_endurance_repl")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    src = Warehouse(spark, os.path.join(root, "src"))
    dst = Warehouse(spark, os.path.join(root, "dst"))
    off = os.path.join(root, "offsets.json")

    def batch(lo, n, seq_base):
        return spark.range(lo, lo + n).select(
            F.col("id").cast("string").alias("uid"),
            F.concat(F.lit("fn_"), F.col("id")).alias("name"),
            F.lit("").alias("address"),
            (F.col("id") % 997).cast("long").alias("size"),
            F.lit("Internal").alias("type"),
        )

    # seed: 50k rows so the table dwarfs the per-commit batches
    src.merge_batch_incremental(
        {"functions": batch(0, 50_000, 0)}, n_buckets=n_buckets
    )
    rows = 50_000
    seq = 1
    waves_out = []
    for w in range(waves):
        v_before = src.versions("functions")[-1]
        for _ in range(per_wave):
            src.merge_batch_incremental(
                {"functions": batch(rows, 37, seq)}, batch_seq=seq + 1
            )
            rows += 37
            seq += 1
        v_after = src.versions("functions")[-1]
        feed_bytes = _changed_bytes(src, "functions", v_before, v_after)
        replicate(src, dst, "functions", off)
        m = src._manifest("functions", v_after)
        table_bytes = sum(m["bytes"].values())
        a, b = src.read("functions"), dst.read("functions")
        resid = a.exceptAll(b).count() + b.exceptAll(a).count()
        waves_out.append(
            {
                "wave": w,
                "table_bytes": table_bytes,
                "feed_bytes": feed_bytes,
                "feed_frac": round(feed_bytes / table_bytes, 4),
                "replica_exact": resid == 0,
            }
        )
        assert resid == 0, f"replica diverged at wave {w}"

    # crash-replay: zero new replica versions
    versions_before = dst.versions("functions")
    applied = src.versions("functions")
    _write_offset(off, "functions", applied[-2])
    replicate(src, dst, "functions", off)
    replay_clean = dst.versions("functions") == versions_before

    shutil.rmtree(root, ignore_errors=True)
    print(
        json.dumps(
            {
                "n_buckets": n_buckets,
                "waves": waves_out,
                "replay_publishes_nothing": replay_clean,
                "feed_frac_first": waves_out[0]["feed_frac"],
                "feed_frac_last": waves_out[-1]["feed_frac"],
            }
        )
    )




def main_auto_maintain() -> None:
    """r12 endurance arm (--auto-maintain): does the UNATTENDED
    maintenance cadence keep a long-running replica's scan time flat
    with ZERO manual maintenance calls?

    Controlled shape: ONE trickle-DML source (each wave: one spread
    MOR delete + one spread MOR update — every wave DVs most buckets),
    TWO replicas drained through the same CDC-apply sink
    (`apply_changes_merge_into`): `auto` passes auto_maintenance=2,
    `manual` never maintains.  Per wave we record each replica's full-
    scan wall seconds and DV debt (files_dvd / tombstone_rows / deepest
    sidecar stack).  The 100 TB claim this prices: the manual replica's
    scan tax climbs with the DV stack (SCALE addendum 58 measured 3.4×
    when all files carry DVs); the auto replica's stays flat because
    the cadence purges debt as it forms — and content remains
    bit-identical to the source on BOTH (asserted every wave).

    Usage: python -m tools.endurance_replication --auto-maintain [waves]
    """
    import time

    from binaryx_graph_spark.streaming.merge_sink import (
        apply_changes_merge_into,
    )

    argv = [a for a in sys.argv[1:] if a != "--auto-maintain"]
    waves = int(argv[0]) if argv else 12
    spark = get_spark("endurance-auto-maintenance")
    root = os.path.join(tempfile.gettempdir(), "bxg_endurance_automaint")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    src = Warehouse(spark, os.path.join(root, "src"))
    dsts = {
        "auto": Warehouse(spark, os.path.join(root, "auto")),
        "manual": Warehouse(spark, os.path.join(root, "manual")),
    }

    n = 60_000
    base = spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )
    src.merge_batch_incremental({"functions": base}, n_buckets=32)
    for d in dsts.values():
        d.merge_batch_incremental({"functions": base}, n_buckets=32)

    def scan_sec(wh):
        t0 = time.time()
        wh.read("functions").agg(F.sum("size")).collect()
        return round(time.time() - t0, 3)

    out = {"waves": [], "n_rows_seeded": n}
    for w in range(waves):
        v0 = src.versions("functions")[-1]
        # spread slices: ~150 deletes + ~151 updates hit most buckets
        src.merge_into(
            "functions",
            base.filter(F.col("size") % 400 == w).select("uid"),
            when_matched_delete=True, when_not_matched_insert=False,
        )
        src.merge_into(
            "functions",
            base.filter(F.col("size") % 397 == w).select(
                "uid", (F.col("size") + 1_000_000).alias("new_size")
            ),
            when_matched_update={"size": F.col("s.new_size")},
            when_not_matched_insert=False,
        )
        head = src.versions("functions")[-1]
        rec = {"wave": w}
        for name, dst in dsts.items():
            for v in range(v0 + 1, head + 1):
                feed = src.read_changes(
                    "functions", v - 1, v, update_images=True
                ).withColumn("_version", F.lit(v))
                apply_changes_merge_into(
                    dst, "functions", feed,
                    auto_maintenance=2 if name == "auto" else None,
                )
            stats = dst.dv_stats("functions")
            rec[name] = {
                "scan_sec": scan_sec(dst),
                "files_dvd": stats["files_dvd"],
                "tombstones": stats["tombstone_rows"],
                "max_stack": stats["max_stack"],
            }
        out["waves"].append(rec)
    # content equality on both replicas at the end
    s_live = src.read("functions")
    for name, dst in dsts.items():
        d_live = dst.read("functions")
        resid = (
            s_live.exceptAll(d_live).unionAll(d_live.exceptAll(s_live)).count()
        )
        out[f"{name}_exact"] = resid == 0
        assert resid == 0, f"{name} replica diverged by {resid} rows"
    first, last = out["waves"][0], out["waves"][-1]
    out["auto_scan_first_to_last"] = round(
        last["auto"]["scan_sec"] / max(first["auto"]["scan_sec"], 1e-9), 3
    )
    out["manual_scan_first_to_last"] = round(
        last["manual"]["scan_sec"] / max(first["manual"]["scan_sec"], 1e-9), 3
    )
    out["manual_final_debt"] = last["manual"]
    out["auto_final_debt"] = last["auto"]
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--auto-maintain" in sys.argv:
        main_auto_maintain()
    else:
        main()
