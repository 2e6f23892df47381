"""Maintain tools/witness_fps.json — the witness-time oracle ledger.

For every query name that has a fully-green row in some
CORRECTNESS_r*.json artifact but no entry in the ledger yet, record the
CURRENT oracle fingerprint.  Run this FIRST THING each round, before any
oracle is edited, so the recorded hash is the one the driver actually
verified.  Existing entries are never overwritten (an oracle edit after
witnessing must invalidate, not refresh).  PROTOCOL for deliberately
changing a witnessed query's oracle: delete its ledger entry in the SAME
commit as the oracle edit — the query re-floats to the sampled head, and
this tool re-adds the fresh fingerprint after the next driver round
witnesses it green.

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
    green: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
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
