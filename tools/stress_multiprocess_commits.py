"""Multi-PROCESS concurrent-writer stress for the manifest commit (r9).

The thread stress (tools/stress_concurrent_commits.py) shares one JVM;
real concurrent writers — a scheduler retry, a compaction job racing an
ingest job — are SEPARATE processes with separate SparkSessions.  This
tool spawns P worker processes (each its own driver JVM) committing M
batches each against ONE warehouse root.  The only coordination is the
commit protocol itself: atomic create-if-absent on the manifest,
rebase-or-raise on conflict, application-level retry on
ConcurrentCommitError (each worker re-runs the merge against the new
head, as the error prescribes).

Parent-side invariants (hard failures):

1. acked commits == manifest versions added (no lost commit),
2. versions strictly consecutive,
3. final state == every worker's LAST batch per key (workers own
   disjoint keys; buckets overlap freely).

Prints one JSON line.  Each worker uses local[8] so P workers fit the
32-core box; run on a quiet machine.

Usage: python -m tools.stress_multiprocess_commits [P] [M]
Worker mode (internal): BXG_STRESS_WORKER=<id> with argv root, M.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS_PER_WORKER = 8


def _session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName(f"stress-mp-{os.environ.get('BXG_STRESS_WORKER', 'parent')}")
        .getOrCreate()
    )


def _fns(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", int(v), "Internal") for k, v in rows],
        "uid string, name string, address string, size long, type string",
    )


def worker(root: str, wid: int, m_commits: int) -> None:
    from binaryx_graph_spark.sources.warehouse import (
        ConcurrentCommitError,
        Warehouse,
    )

    spark = _session(8)
    wh = Warehouse(spark, root)
    retries = 0
    for j in range(1, m_commits + 1):
        rows = [
            (f"w{wid}_k{s}", wid * 10_000 + j) for s in range(KEYS_PER_WORKER)
        ]
        for _attempt in range(128):
            try:
                wh.merge_batch_incremental(
                    {"functions": _fns(spark, rows)}, batch_seq=wid * 1000 + j
                )
                break
            except ConcurrentCommitError:
                retries += 1
        else:
            print(json.dumps({"worker": wid, "error": f"commit {j} starved"}))
            sys.exit(3)
    print(json.dumps({"worker": wid, "retries": retries}))
    sys.exit(0)


def main() -> None:
    if os.environ.get("BXG_STRESS_WORKER"):
        worker(sys.argv[1], int(os.environ["BXG_STRESS_WORKER"]), int(sys.argv[2]))
        return

    p_workers = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    m_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from binaryx_graph_spark.sources.warehouse import Warehouse

    root = os.path.join(tempfile.gettempdir(), "bxg_stress_mp")
    shutil.rmtree(root, ignore_errors=True)
    spark = _session(8)
    wh = Warehouse(spark, root)
    base_rows = [
        (f"w{i}_k{s}", 0) for i in range(p_workers) for s in range(KEYS_PER_WORKER)
    ]
    wh.merge_batch_incremental({"functions": _fns(spark, base_rows)}, batch_seq=0)
    v_base = wh.versions("functions")[-1]

    t0 = time.monotonic()
    procs = []
    for i in range(p_workers):
        env = dict(os.environ, BXG_STRESS_WORKER=str(i))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-m", "tools.stress_multiprocess_commits", root, str(m_commits)],
                env=env,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
        )
    worker_out, errors = [], []
    for i, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=1200)
        line = (out or "").strip().splitlines()[-1] if out else "{}"
        try:
            worker_out.append(json.loads(line))
        except json.JSONDecodeError:
            worker_out.append({"worker": i, "error": "no output"})
        if pr.returncode != 0:
            errors.append(f"worker {i} exited {pr.returncode}: {line[:200]}")
    wall = time.monotonic() - t0

    vs = wh.versions("functions")
    acked = p_workers * m_commits
    if vs != list(range(vs[0], vs[0] + len(vs))):
        errors.append(f"versions not consecutive: {vs}")
    if len(vs) != (v_base + 1) + acked:
        errors.append(f"lost/extra commits: {len(vs)} versions for {acked} acked (+base)")
    got = {r["uid"]: r["size"] for r in wh.read("functions").collect()}
    want = {
        f"w{i}_k{s}": i * 10_000 + m_commits
        for i in range(p_workers)
        for s in range(KEYS_PER_WORKER)
    }
    if got != want:
        diff = {u: (got.get(u), want[u]) for u in want if got.get(u) != want[u]}
        errors.append(f"final state wrong for {len(diff)} keys: {list(diff.items())[:3]}")

    out = {
        "processes": p_workers,
        "commits_per_worker": m_commits,
        "acked_commits": acked,
        "worker_retries": {str(w.get("worker")): w.get("retries") for w in worker_out},
        "versions_total": len(vs),
        "wall_sec": round(wall, 2),
        "errors": errors,
        "ok": not errors,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if not errors else 1)


if __name__ == "__main__":
    main()
