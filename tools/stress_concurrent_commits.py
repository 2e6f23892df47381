"""Concurrent-writer stress for the manifest commit loop (r9).

K threads x M commits each against ONE bucketed table, in one
SparkSession (Spark job submission is thread-safe; the commit's atomic
create-if-absent serializes at the filesystem, exactly as a conditional
PUT would on an object store).  Every thread owns a DISJOINT key set,
so the final table state is exact regardless of commit interleaving —
but the key-buckets overlap freely across threads, so commits race:
some rebase (disjoint touched buckets), some raise
ConcurrentCommitError and are retried at the application level (the
error message's instruction: "re-run it against the new head").

Invariants checked (hard failures, not stats):

1. **No lost commit**: acked commits == manifest versions added — the
   exact failure the r8 os.replace protocol suffered.
2. **Strict serialization**: version numbers are consecutive integers,
   one per acked commit.
3. **Exact final state**: every key's value is its owner thread's LAST
   batch value (threads own disjoint keys), row count exact.
4. **Hammer phase**: all threads update the SAME key concurrently;
   every commit still serializes (invariants 1-2), the key holds
   exactly one row, and its value is one of the writers' (LWW by
   commit order).

Prints one JSON line: commits, retries, wall seconds per phase.

Timing-probe hygiene (memory/round-protocol): run on a quiet machine —
this tool owns its local[32] JVM.

Usage: python -m tools.stress_concurrent_commits [K] [M]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    k_threads = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    m_commits = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import SparkSession

    from binaryx_graph_spark.sources.warehouse import (
        ConcurrentCommitError,
        Warehouse,
    )

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("stress-concurrent-commits")
        .getOrCreate()
    )
    root = os.path.join(tempfile.gettempdir(), "bxg_stress_concurrency")
    shutil.rmtree(root, ignore_errors=True)

    def fns(rows):
        return spark.createDataFrame(
            [(str(k), f"fn_{k}", "", int(v), "Internal") for k, v in rows],
            "uid string, name string, address string, size long, type string",
        )

    wh0 = Warehouse(spark, root)
    keys_per_thread = 8
    base_rows = [
        (f"t{i}_k{j}", 0) for i in range(k_threads) for j in range(keys_per_thread)
    ]
    wh0.merge_batch_incremental({"functions": fns(base_rows)}, batch_seq=0)
    v_start = wh0.versions("functions")[-1]

    retries = {"disjoint_keys": 0, "hammer": 0}
    lock = threading.Lock()
    errors: list[str] = []

    def run_phase(phase: str, batch_rows_for):
        """Each thread: m_commits batches; on ConcurrentCommitError,
        re-run the merge against the new head (the documented retry)."""

        def work(i: int):
            try:
                wh = Warehouse(spark, root)  # one writer handle per thread
                for j in range(1, m_commits + 1):
                    rows = batch_rows_for(i, j)
                    for attempt in range(64):
                        try:
                            wh.merge_batch_incremental(
                                {"functions": fns(rows)}, batch_seq=i * 1000 + j
                            )
                            break
                        except ConcurrentCommitError:
                            with lock:
                                retries[phase] += 1
                    else:
                        with lock:
                            errors.append(f"{phase}: thread {i} commit {j} starved")
            except Exception as e:  # a silently dead thread would fake "acked"
                with lock:
                    errors.append(f"{phase}: thread {i} died: {type(e).__name__}: {e}")

        threads = [
            threading.Thread(target=work, args=(i,)) for i in range(k_threads)
        ]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.monotonic() - t0

    # --- phase 1: disjoint key ownership, overlapping buckets
    wall_disjoint = run_phase(
        "disjoint_keys",
        lambda i, j: [(f"t{i}_k{s}", i * 10_000 + j) for s in range(keys_per_thread)],
    )
    wh = Warehouse(spark, root)
    vs = wh.versions("functions")
    acked = k_threads * m_commits
    if vs != list(range(vs[0], vs[0] + len(vs))):
        errors.append(f"versions not consecutive: {vs}")
    if len(vs) != (v_start + 1) + acked:
        errors.append(
            f"lost/extra commits: {len(vs)} versions for {acked} acked (+base)"
        )
    got = {r["uid"]: r["size"] for r in wh.read("functions").collect()}
    want = {
        f"t{i}_k{s}": i * 10_000 + m_commits
        for i in range(k_threads)
        for s in range(keys_per_thread)
    }
    if got != want:
        diff = {u: (got.get(u), want[u]) for u in want if got.get(u) != want[u]}
        errors.append(f"final state wrong for {len(diff)} keys: {list(diff.items())[:3]}")

    # --- phase 2: hammer one key from every thread
    n_before = len(wh.versions("functions"))
    wall_hammer = run_phase("hammer", lambda i, j: [("t0_k0", 900_000 + i * 100 + j)])
    vs2 = wh.versions("functions")
    if len(vs2) != n_before + acked:
        errors.append(
            f"hammer lost commits: {len(vs2) - n_before} versions for {acked} acked"
        )
    if vs2 != list(range(vs2[0], vs2[0] + len(vs2))):
        errors.append(f"hammer versions not consecutive: {vs2}")
    rows = wh.read("functions").where("uid = 't0_k0'").collect()
    if len(rows) != 1:
        errors.append(f"hammer key has {len(rows)} rows (LWW broken)")
    elif not (900_000 <= rows[0]["size"] < 901_000):
        errors.append(f"hammer key value {rows[0]['size']} not from any writer")

    out = {
        "threads": k_threads,
        "commits_per_thread": m_commits,
        "keys_per_thread": keys_per_thread,
        "acked_commits_per_phase": acked,
        "retries": retries,
        "wall_disjoint_sec": round(wall_disjoint, 2),
        "wall_hammer_sec": round(wall_hammer, 2),
        "versions_total": len(vs2),
        "errors": errors,
        "ok": not errors,
    }
    print(json.dumps(out))
    shutil.rmtree(root, ignore_errors=True)
    sys.exit(0 if not errors else 1)


if __name__ == "__main__":
    main()
