"""Per-query profile: wall time, Spark job/stage/task counts, and the
formatted physical plan — the guide-§1 "measure first" artifact for the
optimization rounds.

Usage:
    python tools/profile_queries.py [sf_dir] [--plans-dir DIR] [--json OUT]
                                    [--runs N] [query ...]

For each query (default: bench.py's HEADLINE set) this runs the same
timed action as bench.py (df.count()) inside a dedicated job group and
records, from the status tracker, how many jobs/stages/tasks the action
scheduled.  Job count × per-job scheduling floor is the fixed overhead a
query pays regardless of data volume (SCALE.md addendum 31), so at small
SF the job/stage counts are the first thing to look at, before plan
shape.  Plans (``explain("formatted")``) go one file per query into
--plans-dir when given.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.registry import load_all  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    plans_dir = None
    out_json = None
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans-dir":
            plans_dir = args[i + 1]
            i += 2
        elif a == "--json":
            out_json = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif os.path.isdir(a):
            sf_dir = a
            i += 1
        else:
            names.append(a)
            i += 1

    reg = load_all()
    if not names:
        import bench

        names = [n for n in bench.HEADLINE if n in reg]
    spark = get_spark("profile")
    sc = spark.sparkContext

    # warm: parquet footers, codegen, broadcast machinery
    warm = "/root/testdata/sf0.001"
    if os.path.isdir(warm) and warm != sf_dir:
        for n in names:
            try:
                reg[n].fn(spark, warm).count()
            except Exception:
                pass

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)

    results: dict[str, dict] = {}
    for n in names:
        q = reg[n]
        walls: list[float] = []
        jobs = stages = tasks = 0
        for r in range(runs):
            group = f"prof-{n}-{r}"
            sc.setJobGroup(group, n)
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            rows = df.count()
            walls.append(time.time() - t0)
            sc.setJobGroup(None, None)
            if r == runs - 1:  # count scheduling work of the LAST run
                st = sc.statusTracker()
                jids = st.getJobIdsForGroup(group)
                jobs = len(jids)
                for j in jids:
                    ji = st.getJobInfo(j)
                    if ji is None:
                        continue
                    stages += len(ji.stageIds)
                    for s in ji.stageIds:
                        si = st.getStageInfo(s)
                        if si is not None:
                            tasks += si.numTasks
        walls.sort()
        results[n] = {
            "min_s": round(walls[0], 3),
            "med_s": round(walls[len(walls) // 2], 3),
            "rows": rows,
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        print(
            f"{n:45s} min {walls[0]:6.3f}s  jobs {jobs:3d}  stages {stages:3d}"
            f"  tasks {tasks:5d}  rows {rows}",
            file=sys.stderr,
        )
        if plans_dir:
            try:
                plan = reg[n].fn(spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception:
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    reg[n].fn(spark, sf_dir).explain("formatted")
                plan = buf.getvalue()
            with open(os.path.join(plans_dir, f"{n}.txt"), "w") as fh:
                fh.write(plan)
    if out_json:
        with open(out_json, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
    total = sum(v["min_s"] for v in results.values())
    print(
        f"TOTAL min {total:.3f}s  jobs {sum(v['jobs'] for v in results.values())}"
        f"  stages {sum(v['stages'] for v in results.values())}",
        file=sys.stderr,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
