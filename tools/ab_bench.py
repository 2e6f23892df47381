"""Same-session A/B bench forensics (r6 verdict directive #1).

Runs the common headline-query set of TWO repo checkouts (git worktrees)
inside ONE SparkSession and ONE process, interleaved at the QUERY level:
for each query the schedule is A,B,B,A back-to-back, so slow session
drift (GC pressure, listener-bus backlog, context age — the confounds
that made the r5→r6 +9.8% cross-session delta unfalsifiable, and that
biased a phase-level ABBA pilot: its min-pooling favored whichever side
ran in the freshest phase) cancels within each query's few-second
window.  Both sides' registries are materialized ONCE up front — after
purging sys.modules the old side's function objects stay alive with
their own module globals — so switching sides per query costs nothing.

Each side boundary also records the CPU-calibration probe and (when the
checkout has one) the job-scheduling-floor probe so a skeptic can
decompose any residual delta into compute vs floor terms.

Usage:
    python tools/ab_bench.py <checkout_A> <checkout_B> [--runs 2] \
        [--out AB_RESULT.json]
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import sys
import time


def _load_side(checkout: str):
    """Import a checkout's bench module + query registry in isolation.
    Purging sys.modules unbinds the PREVIOUS side's modules by name but
    leaves its already-created function objects fully alive."""
    for mod in [m for m in sys.modules if m.split(".")[0] in ("binaryx_graph_spark", "bench")]:
        del sys.modules[mod]
    sys.path[:] = [p for p in sys.path if not os.path.exists(os.path.join(p, "binaryx_graph_spark"))]
    sys.path.insert(0, checkout)
    bench = importlib.import_module("bench")
    registry = importlib.import_module("binaryx_graph_spark.registry")
    return bench, registry.load_all()


def _probes(bench_mod, spark) -> dict:
    return {
        "calib": bench_mod._calibrate(spark) if hasattr(bench_mod, "_calibrate") else None,
        "floor": bench_mod._floor_probe(spark) if hasattr(bench_mod, "_floor_probe") else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkout_a")
    ap.add_argument("checkout_b")
    ap.add_argument("--runs", type=int, default=2, help="runs per side per half (total 2x)")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    ap.add_argument("--queries", default=None, help="comma list; default = common HEADLINE")
    args = ap.parse_args()

    ca, cb = os.path.abspath(args.checkout_a), os.path.abspath(args.checkout_b)

    bench_a, reg_a = _load_side(ca)
    head_a = list(bench_a.HEADLINE)
    bench_b, reg_b = _load_side(cb)
    head_b = list(bench_b.HEADLINE)
    if args.queries:
        common = [q.strip() for q in args.queries.split(",") if q.strip()]
    else:
        common = [q for q in head_a if q in head_b and q in reg_a and q in reg_b]
    print(f"# common set: {len(common)} queries", file=sys.stderr)

    from binaryx_graph_spark.session import get_spark  # side B's session module

    spark = get_spark("ab_bench")
    spark.range(1).count()

    # Warm BOTH sides at the smallest SF so neither pays first-touch
    # costs inside its timed runs.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for reg in (reg_a, reg_b):
            for name in common:
                try:
                    reg[name].fn(spark, warm_dir).count()
                except Exception:
                    pass

    results: dict[str, dict[str, list[float]]] = {"A": {}, "B": {}}
    probe_log = [{"at": "start", **_probes(bench_b, spark)}]

    sides = {"A": reg_a, "B": reg_b}
    for qi, name in enumerate(common):
        for label in ("A", "B", "B", "A"):
            reg = sides[label]
            runs = results[label].setdefault(name, [])
            for _ in range(args.runs):
                t0 = time.time()
                try:
                    reg[name].fn(spark, args.sf_dir).count()
                except Exception as e:
                    print(f"# {label}/{name}: FAILED {e}", file=sys.stderr)
                    break
                runs.append(time.time() - t0)
        if (qi + 1) % 10 == 0:
            probe_log.append({"at": f"after_q{qi + 1}", **_probes(bench_b, spark)})
            print(f"# {qi + 1}/{len(common)} queries done", file=sys.stderr)
    probe_log.append({"at": "end", **_probes(bench_b, spark)})

    summary = {}
    for name in common:
        ra, rb = sorted(results["A"].get(name, [])), sorted(results["B"].get(name, []))
        if not ra or not rb:
            continue
        mina, minb = ra[0], rb[0]
        meda, medb = ra[len(ra) // 2], rb[len(rb) // 2]
        summary[name] = {
            "a_min": round(mina, 3),
            "b_min": round(minb, 3),
            "a_med": round(meda, 3),
            "b_med": round(medb, 3),
            "b_over_a_min": round(minb / mina, 3) if mina > 0 else None,
        }

    out = {
        "design": "query-interleaved ABBA",
        "checkout_a": ca,
        "checkout_b": cb,
        "sf_dir": args.sf_dir,
        "runs_per_side_per_half": args.runs,
        "probes": probe_log,
        "total_a_min": round(sum(v["a_min"] for v in summary.values()), 3),
        "total_b_min": round(sum(v["b_min"] for v in summary.values()), 3),
        "total_a_med": round(sum(v["a_med"] for v in summary.values()), 3),
        "total_b_med": round(sum(v["b_med"] for v in summary.values()), 3),
        "queries": summary,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
