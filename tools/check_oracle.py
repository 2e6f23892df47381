"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at the given
scale factor, compares row count, column names/types, and an
order-insensitive canonical value multiset. Strict: any value difference
(including float ulps) fails — the real driver's hash can't be looser.

Usage:
    python tools/check_oracle.py [sf_dir] [--json OUT.json] [query ...]

With --json, writes {name: {"ok": bool, "rows": n, "sec": s, "mode":
"oracle"|"rows_only", "detail": str}} so a full-catalog run is an
auditable artifact (LOCALGATE_rN.json) without re-running Spark.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from binaryx_graph_spark.model import TESTDATA_TABLES  # noqa: E402
from binaryx_graph_spark.registry import load_all  # noqa: E402
from binaryx_graph_spark.session import get_spark  # noqa: E402


def canon(v) -> str:
    """Canonical string for one value (both engines land here via pandas)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — any ulp difference fails
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    import numpy as np

    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating,)):
        return canon(float(v))
    return str(v)


def frame_multiset(df) -> tuple[list[str], list[str]]:
    """(sorted column names, sorted canonical row strings) of a pandas df."""
    cols = sorted(df.columns)
    rows = [
        "|".join(canon(row[c]) for c in cols)
        for _, row in df.iterrows()
    ]
    return cols, sorted(rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv and os.path.isdir(argv[0]) else "/root/testdata/sf0.01"
    wanted = [a for a in argv if not os.path.isdir(a)]

    reg = load_all()
    spark = get_spark("oracle-check")

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    names = wanted or sorted(reg)
    failures = []
    report: dict[str, dict] = {}

    def record(name, ok, rows, t0, mode, detail=""):
        report[name] = {
            "ok": ok,
            "rows": rows,
            "sec": round(time.time() - t0, 2),
            "mode": mode,
            "detail": detail[:500],
        }

    for name in names:
        q = reg[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            spark_pd = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            record(name, False, -1, t0, "oracle", f"spark error: {e}")
            print(f"FAIL {name}: spark error: {e}")
            continue
        if q.oracle is None:
            record(name, True, len(spark_pd), t0, "rows_only")
            print(f"ok   {name}: rows-only ({len(spark_pd)} rows, {time.time()-t0:.1f}s, no oracle)")
            continue
        try:
            duck_pd = con.execute(q.oracle).fetchdf()
        except Exception as e:
            failures.append(name)
            record(name, False, len(spark_pd), t0, "oracle", f"duckdb error: {e}")
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        scols, srows = frame_multiset(spark_pd)
        dcols, drows = frame_multiset(duck_pd)
        status = []
        if scols != dcols:
            status.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        elif srows != drows:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b)
            status.append(f"values differ at sorted-row {diff[0]}:\n  spark={diff[1]}\n  duck ={diff[2]}")
        # dtype check (loose: compare pandas kind letters after sorting cols)
        skinds = [spark_pd[c].dtype.kind if c in spark_pd else "?" for c in scols]
        dkinds = [duck_pd[c].dtype.kind if c in duck_pd else "?" for c in dcols]
        if scols == dcols and skinds != dkinds:
            status.append(f"dtypes spark={skinds} duck={dkinds}")
        if status:
            failures.append(name)
            record(name, False, len(srows), t0, "oracle", "; ".join(status))
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            record(name, True, len(srows), t0, "oracle")
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "total": len(names),
                    "ok": len(names) - len(failures),
                    "queries": report,
                },
                f,
                indent=1,
                sort_keys=True,
            )
        print(f"wrote {json_out}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
