"""Domain-mixture resampling: exact isqrt correction and allocation."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from binaryx_graph_spark.queries.pipeline_ext import _ISQRT


def test_isqrt_exact_on_boundaries(spark):
    # perfect squares, squares±1, and a large value near the double
    # precision edge — the ±1 correction must pin floor(sqrt(n)) exactly
    ns = [0, 1, 2, 3, 4, 8, 9, 10, 15, 16, 17, 24, 25, 26, 10**12, 10**12 + 1]
    expr = _ISQRT.format(n="n")
    rows = spark.sql(
        "SELECT n, {e} AS r FROM VALUES {vals} AS t(n)".format(
            e=expr, vals=", ".join(f"({n}L)" for n in ns)
        )
    ).collect()
    for r in rows:
        assert r["r"] == math.isqrt(r["n"]), r
    # same expression, same answers in DuckDB
    duck = duckdb.sql(
        "SELECT n, {e} AS r FROM (SELECT unnest({ns}) AS n)".format(e=expr, ns=list(ns))
    ).fetchall()
    for n, r in duck:
        assert r == math.isqrt(n), (n, r)
