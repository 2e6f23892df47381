"""Artifact-hygiene check: registry vs generated artifacts.

Asserts, without running Spark:
  (a) registry names == latest LOCALGATE_r*.json query names (the local
      gate artifact must cover exactly the registered catalog — the r5
      verdict caught a 231≠232 drift this check would have flagged);
  (b) ``_WITNESS_PRIORITY`` ⊆ registry (no stale priority entries);
  (c) PLANS.md ``## <name>`` section count == registry count;
  (d) QUERIES.md row count == registry count;
  (e) every witness_fps.json / witness_tombstones.json key ∈ registry.

Run in the end-of-round snapshot (and any time after registering or
removing a query).  Exit code 1 on any drift.

Usage: python -m tools.check_artifacts
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.registry import _WITNESS_PRIORITY, load_all  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    reg = load_all()
    names = set(reg)
    problems: list[str] = []

    # (a) latest LOCALGATE covers exactly the registry
    gates = sorted(glob.glob(os.path.join(REPO, "LOCALGATE_r*.json")))
    if gates:
        latest = gates[-1]
        with open(latest) as f:
            gate = json.load(f)
        gate_names = set(gate.get("queries", {}))
        missing = sorted(names - gate_names)
        extra = sorted(gate_names - names)
        if missing:
            problems.append(f"(a) {os.path.basename(latest)} missing {len(missing)} registered queries: {missing[:10]}")
        if extra:
            problems.append(f"(a) {os.path.basename(latest)} has {len(extra)} unregistered names: {extra[:10]}")
    else:
        problems.append("(a) no LOCALGATE_r*.json artifact found")

    # (b) priority list has no stale entries
    stale = [n for n in _WITNESS_PRIORITY if n not in names]
    if stale:
        problems.append(f"(b) _WITNESS_PRIORITY entries not in registry: {stale}")

    # (c) PLANS.md section count
    plans_path = os.path.join(REPO, "PLANS.md")
    if os.path.exists(plans_path):
        with open(plans_path) as f:
            plan_names = set(re.findall(r"^## (\S+)$", f.read(), re.M))
        if plan_names != names:
            problems.append(
                f"(c) PLANS.md has {len(plan_names)} sections vs {len(names)} registered"
                f" (missing: {sorted(names - plan_names)[:10]}, extra: {sorted(plan_names - names)[:10]})"
            )
    else:
        problems.append("(c) PLANS.md not found")

    # (d) QUERIES.md row count
    queries_path = os.path.join(REPO, "QUERIES.md")
    if os.path.exists(queries_path):
        with open(queries_path) as f:
            q_names = set(re.findall(r"^\| `([^`]+)` \|", f.read(), re.M))
        if q_names != names:
            problems.append(
                f"(d) QUERIES.md has {len(q_names)} rows vs {len(names)} registered"
                f" (missing: {sorted(names - q_names)[:10]}, extra: {sorted(q_names - names)[:10]})"
            )
    else:
        problems.append("(d) QUERIES.md not found")

    # (e) ledger keys all registered
    for fname in ("witness_fps.json", "witness_tombstones.json"):
        path = os.path.join(REPO, "tools", fname)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            keys = set(json.load(f))
        bad = sorted(keys - names)
        if bad:
            problems.append(f"(e) {fname} keys not in registry: {bad[:10]}")

    if problems:
        print(f"ARTIFACT DRIFT ({len(problems)}):")
        for p in problems:
            print(" -", p)
        return 1
    print(f"artifacts consistent: {len(names)} queries across registry, LOCALGATE, PLANS.md, QUERIES.md, ledgers")
    return 0


if __name__ == "__main__":
    sys.exit(main())
