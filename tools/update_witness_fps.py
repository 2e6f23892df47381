"""Maintain tools/witness_fps.json — the witness-time oracle ledger.

For every query name that has a fully-green row in some
CORRECTNESS_r*.json artifact but no entry in the ledger yet, record the
CURRENT oracle fingerprint.  Run this FIRST THING each round, before any
oracle is edited, so the recorded hash is the one the driver actually
verified.  Existing entries are never overwritten (an oracle edit after
witnessing must invalidate, not refresh).  PROTOCOL for deliberately
changing a witnessed query's oracle: delete its ledger entry AND add a
tombstone row ``{name: N}`` to tools/witness_tombstones.json (N = the
next driver round) in the SAME commit as the oracle edit — the query
re-floats to the sampled head, and this tool re-adds the fresh
fingerprint only once a CORRECTNESS_r{>=N} artifact witnesses it green.
Without the tombstone, a green row from a PRE-change round would vouch
for the post-change oracle it never tested (the r5→r6
graph_cycle_detection near-miss).

Usage: python -m tools.update_witness_fps
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.registry import REGISTRY, load_all, oracle_fingerprint  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ledger_path = os.path.join(repo, "tools", "witness_fps.json")
    try:
        with open(ledger_path) as f:
            ledger: dict[str, str] = json.load(f)
    except Exception:
        ledger = {}

    load_all()
    try:
        with open(os.path.join(repo, "tools", "witness_tombstones.json")) as f:
            tombstones: dict[str, int] = json.load(f)
    except Exception:
        tombstones = {}

    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        base = os.path.basename(path)  # CORRECTNESS_r05.json
        try:
            rnd = int(base.split("_r")[1].split(".")[0])
        except (IndexError, ValueError):
            rnd = 0
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if rnd < tombstones.get(name, 0):
                continue  # green row predates the oracle change; cannot vouch
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)

    added = 0
    for name in sorted(green):
        if name in ledger or name not in REGISTRY:
            continue
        ledger[name] = oracle_fingerprint(REGISTRY[name].oracle)
        added += 1

    with open(ledger_path, "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"witness_fps.json: {len(ledger)} entries ({added} added)")


if __name__ == "__main__":
    main()
