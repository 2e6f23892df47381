"""Streaming-ingest ENDURANCE probe (r7 verdict #3): ~100 micro-batch
commits through ``stream_analysis_json(incremental=True)`` with a
compaction/vacuum cadence, recording per-commit wall time and live file
count.

The claim under test (SCALE.md addendum 39 measured it at 3-commit
depth): incremental bucket-granular commits keep per-commit cost
INDEPENDENT of table size, so a long stream is O(n) total where the
whole-table-rewrite ``merge_batch`` is O(n²).  This probe demonstrates
it at stream length: N_WAVES waves of WAVE_FILES one-file micro-batches
each (one MERGE commit per file via ``maxFilesPerTrigger=1``), through
ONE persistent checkpoint — so successive availableNow runs RESUME, and
``Warehouse.optimize`` + ``vacuum`` interleave between waves exactly as
a production maintenance cadence would.  Per commit we record the
streaming engine's own ``triggerExecution`` duration (covers the whole
foreachBatch merge); per wave we record the live file count (manifest)
and the on-disk file count (live + time-travel versions, bounded by
vacuum).

A control run drives the SAME inputs through the full-rewrite
``merge_batch`` path — its per-commit cost must GROW with the table
while the incremental path stays flat.

``--seed-rows N`` pre-grows the functions table with N rows BEFORE the
stream (one bulk commit), so "flat" is a claim about commits against a
LARGE table — at gate scale an unseeded table never leaves the fixed
per-job overhead floor, and both paths would read flat (the addendum-35
lesson: the control design is the measurement).

Usage: python tools/endurance_stream.py [n_waves] [wave_files]
           [--control] [--seed-rows N]
Prints one JSON line + a markdown summary for SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.session import get_spark  # noqa: E402
from binaryx_graph_spark.sources.warehouse import Warehouse  # noqa: E402
from binaryx_graph_spark.streaming.ingest_stream import stream_analysis_json  # noqa: E402

WATCHED = ("binaries", "functions", "strings", "calls", "contains")


def synth_doc(i: int) -> dict:
    """A distinct small analysis document per commit: one new binary,
    5 functions, intra-binary calls, 3 strings, 1 import — so the
    warehouse GROWS linearly over the stream while every batch stays
    constant-size (the shape that separates O(batch) commits from
    O(table) ones)."""
    base = 0x400000 + i * 0x1000
    fns = [
        {"name": f"fn_{i}_{j}", "address": hex(base + j * 0x10), "size": 16 + j}
        for j in range(5)
    ]
    calls = [
        {
            "from_address": hex(base + j * 0x10),
            "to_address": hex(base + ((j + 1) % 5) * 0x10),
            "offset": hex(base + j * 0x10 + 4),
            "type": "direct",
        }
        for j in range(5)
    ]
    return {
        "binary_info": {
            "name": f"bin_{i}.exe",
            "file_path": f"/samples/bin_{i}.exe",
            "file_size": 4096 + i,
            "file_type": {"type": "PE32", "architecture": "x86"},
            "hashes": {"sha256": f"{i:064x}"},
        },
        "functions": fns,
        "strings": [
            {"value": f"str_{i}_{k}", "address": hex(base + 0x800 + k)}
            for k in range(3)
        ],
        "imports": [{"name": "CreateFileA", "address": hex(base + 0x900), "library": "KERNEL32"}],
        "exports": [],
        "calls": calls,
    }


def run(mode: str, n_waves: int, wave_files: int, scratch: str, seed_rows: int = 0) -> dict:
    from pyspark.sql import functions as F

    spark = get_spark()
    incremental = mode == "incremental"
    root = os.path.join(scratch, f"wh_{mode}")
    in_dir = os.path.join(scratch, f"in_{mode}")
    ckpt = os.path.join(scratch, f"ckpt_{mode}")
    os.makedirs(in_dir, exist_ok=True)
    wh = Warehouse(spark, root)
    wh.clear()
    if seed_rows:
        fns = spark.range(seed_rows).select(
            F.concat(F.lit("seed_"), F.col("id")).alias("uid"),
            F.concat(F.lit("sfn_"), F.col("id")).alias("name"),
            F.lit("").alias("address"),
            (F.col("id") % 997).cast("long").alias("size"),
            F.lit("Internal").alias("type"),
        )
        commit = wh.merge_batch_incremental if incremental else wh.merge_batch
        commit({"functions": fns})

    commit_ms: list[float] = []
    waves = []
    n = 0
    for w in range(n_waves):
        for _ in range(wave_files):
            with open(os.path.join(in_dir, f"doc_{n:05d}.json"), "w") as f:
                json.dump(synth_doc(n), f)
            n += 1
        q = stream_analysis_json(
            spark, in_dir, root,
            max_files_per_trigger=1,
            incremental=incremental,
            checkpoint_location=ckpt,
            merge_tables=WATCHED,
        )
        q.awaitTermination()
        # the engine's own per-trigger durations (includes the merge in
        # foreachBatch); availableNow emits one final empty no-data
        # trigger per run — drop triggers that processed no rows
        prog = [json.loads(p.json) for p in q.recentProgress]
        commit_ms += [
            p["durationMs"]["triggerExecution"]
            for p in prog
            if p.get("numInputRows", 0) > 0
        ]
        # maintenance cadence: compact + prune the time-travel horizon
        if (w + 1) % 3 == 0 or w == n_waves - 1:
            wh.optimize(target_bytes=128 * 1024 * 1024)
            wh.vacuum(keep_last=2)
        live = disk = 0
        for t in WATCHED:
            if incremental:
                live += sum(len(v) for v in wh._live_bucket_files(t).values())
            else:
                live += len(
                    [p for p in (wh.root / t).glob("part-*") if p.is_file()]
                )
            disk += len(
                [
                    p
                    for p in (wh.root / t).rglob("*")
                    if p.is_file() and not p.name.startswith((".", "_"))
                ]
            )
        waves.append({"wave": w, "commits": len(commit_ms), "live_files": live, "disk_files": disk})
    total_rows = {t: wh.read(t).count() for t in WATCHED}
    k = max(1, len(commit_ms) // 10)
    first, last = commit_ms[:k], commit_ms[-k:]
    return {
        "mode": mode,
        "n_commits": len(commit_ms),
        "commit_ms": commit_ms,
        "first_decile_mean_ms": round(sum(first) / len(first), 1),
        "last_decile_mean_ms": round(sum(last) / len(last), 1),
        "growth_ratio": round((sum(last) / len(last)) / (sum(first) / len(first)), 3),
        "waves": waves,
        "rows": total_rows,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_waves = int(args[0]) if args else 10
    wave_files = int(args[1]) if len(args) > 1 else 10
    control = "--control" in sys.argv
    seed = 0
    for a in sys.argv[1:]:  # --seed-rows=N form only (keeps positional args unambiguous)
        if a.startswith("--seed-rows="):
            seed = int(a.split("=", 1)[1])
    scratch = tempfile.mkdtemp(prefix="bxg_endurance_")
    try:
        out = {"incremental": run("incremental", n_waves, wave_files, scratch, seed)}
        if control:
            out["full_rewrite"] = run("full_rewrite", n_waves, wave_files, scratch, seed)
        print(json.dumps(out))
        for mode, r in out.items():
            print(
                f"\n{mode}: {r['n_commits']} commits | "
                f"first-decile {r['first_decile_mean_ms']} ms → "
                f"last-decile {r['last_decile_mean_ms']} ms "
                f"(growth ×{r['growth_ratio']}) | "
                f"live files {r['waves'][-1]['live_files']}, "
                f"disk files {r['waves'][-1]['disk_files']} at end",
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
