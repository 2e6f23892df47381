"""Attribute a query's wall time to the Python-side Spark ACTIONS it
fires (localCheckpoint / count / collect / toPandas / write), by
callsite — the guide-§1 empirical loop for a codebase where explain()
can't see past checkpoint boundaries.

Usage:
    python tools/action_trace.py <query> [sf_dir] [--runs N]

Prints one line per action callsite with total seconds and call count,
plus the query's total wall.  Run on a QUIET machine: times are wall.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:  # Spark 4: the concrete class overrides the pyspark.sql.DataFrame ABC
    from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
except ImportError:  # Spark 3
    from pyspark.sql import DataFrame  # noqa: E402

from binaryx_graph_spark.registry import load_all  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402

SITES: dict[str, list[float]] = {}


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "binaryx_graph_spark" in fn or fn.endswith("__spark_entry__.py"):
            return f"{os.path.relpath(fn, '/root/repo')}:{fr.lineno} {fr.name}"
    return "<outside>"


def _wrap(cls, meth):
    orig = getattr(cls, meth)

    def timed(self, *a, **kw):
        s = _site()
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            SITES.setdefault(f"{meth:15s} {s}", []).append(time.time() - t0)

    setattr(cls, meth, timed)


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ns = ap.parse_args()
    qname, sf_dir, runs = ns.query, ns.sf_dir, ns.runs

    for m in ("localCheckpoint", "count", "collect", "toPandas", "first", "take", "isEmpty"):
        _wrap(DataFrame, m)
    # writes are actions too (the warehouse DML paths are write-heavy);
    # r13: 65 s of warehouse_replication_certified was invisible to the
    # wrapper until DataFrameWriter was included
    try:
        from pyspark.sql.classic.dataframe import DataFrameWriter  # Spark 4
    except ImportError:
        from pyspark.sql import DataFrameWriter
    for m in ("parquet", "save", "saveAsTable", "csv", "json"):
        if hasattr(DataFrameWriter, m):
            _wrap(DataFrameWriter, m)
    # reads list files + read footers EAGERLY at .parquet() time — a
    # driver-side cost worth attributing on manifest-heavy paths
    try:
        from pyspark.sql.classic.readwriter import DataFrameReader  # Spark 4
    except ImportError:
        from pyspark.sql import DataFrameReader
    if hasattr(DataFrameReader, "parquet"):
        _wrap(DataFrameReader, "parquet")

    reg = load_all()
    spark = get_spark("trace")
    # warm
    try:
        reg[qname].fn(spark, "/root/testdata/sf0.001").count()
    except Exception:
        pass
    best = None
    for _ in range(runs):
        SITES.clear()
        t0 = time.time()
        df = reg[qname].fn(spark, sf_dir)
        n = df.count()
        wall = time.time() - t0
        if best is None or wall < best[0]:
            best = (wall, {k: list(v) for k, v in SITES.items()}, n)
    wall, sites, n = best
    print(f"{qname} @ {sf_dir}: wall {wall:.3f}s, {n} rows")
    tot = 0.0
    for k, v in sorted(sites.items(), key=lambda kv: -sum(kv[1])):
        tot += sum(v)
        print(f"  {sum(v):7.3f}s  x{len(v):3d}  {k}")
    print(f"  {tot:7.3f}s  attributed to actions; {wall - tot:.3f}s plan-build + final action")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
