"""Differential property tests for the Cypher aggregation tail:
sum/min/max/avg with implicit grouping, WITH ... ORDER BY ... SKIP/LIMIT
pagination, and two-stage (aggregate-over-alias) pipelines — every
compiled plan checked against an independent pure-Python reference over
the collected micro-graph fixture (the strategy of
test_cypher_properties.py, extended to the aggregate surface the
reference's stats queries generalize to)."""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.cypher import cypher
from binaryx_graph_spark.queries.ingest_demo import graph_tables


@pytest.fixture(scope="module")
def g(spark):
    t = graph_tables(spark)
    funcs = {r["uid"]: r.asDict() for r in t["functions"].collect()}
    calls = [(r["src_uid"], r["dst_uid"]) for r in t["calls"].collect()]
    return {"t": t, "funcs": funcs, "calls": calls}


def _ref_groups(g):
    """caller name -> list of callee sizes (one per CALLS edge) — the
    one-row-per-relationship multiset Cypher aggregates see."""
    by = defaultdict(list)
    for cu, du in g["calls"]:
        by[g["funcs"][cu]["name"]].append(g["funcs"][du]["size"])
    return by


AGGS = ["count", "sum", "min", "max", "avg"]


def _ref_agg(fn, sizes):
    if fn == "count":
        return len(sizes)
    if fn == "sum":
        return sum(sizes)
    if fn == "min":
        return min(sizes)
    if fn == "max":
        return max(sizes)
    return sum(sizes) / len(sizes)  # avg: IEEE double division both sides


@given(fn=st.sampled_from(AGGS))
@settings(max_examples=10, deadline=None)
def test_implicit_grouping_matches_python(g, fn):
    """RETURN caller, AGG(callee.size) groups by the non-aggregate item
    and agrees with the Python reference on every group."""
    expr = "count(*)" if fn == "count" else f"{fn}(callee.size)"
    df = cypher(
        g["t"],
        f"""
        MATCH (caller:Function)-[:CALLS]->(callee:Function)
        RETURN caller.name AS caller, {expr} AS val
        ORDER BY caller
        """,
    )
    got = {r["caller"]: r["val"] for r in df.collect()}
    want = {k: _ref_agg(fn, v) for k, v in _ref_groups(g).items()}
    assert got == want


@given(
    skip=st.integers(0, 4),
    limit=st.integers(1, 4),
    desc=st.booleans(),
)
@settings(max_examples=12, deadline=None)
def test_with_orderby_skip_limit_pagination(g, skip, limit, desc):
    """WITH caller, count(*) ORDER BY n [DESC], caller SKIP s LIMIT k is
    exactly the Python-sorted group list sliced [s : s+k] — the
    deterministic caller tie-break makes every page reproducible."""
    d = "DESC" if desc else "ASC"
    df = cypher(
        g["t"],
        f"""
        MATCH (caller:Function)-[:CALLS]->(callee:Function)
        WITH caller.name AS caller, count(*) AS n
        ORDER BY n {d}, caller ASC
        SKIP {skip} LIMIT {limit}
        RETURN caller, n
        """,
    )
    got = [(r["caller"], r["n"]) for r in df.collect()]
    ref = sorted(
        ((k, len(v)) for k, v in _ref_groups(g).items()),
        key=lambda kv: (-kv[1] if desc else kv[1], kv[0]),
    )
    assert got == ref[skip : skip + limit]


@given(
    skip=st.integers(0, 3),
    limit=st.integers(1, 4),
    fn=st.sampled_from(["sum", "min", "max", "avg"]),
)
@settings(max_examples=12, deadline=None)
def test_two_stage_aggregate_over_alias(g, skip, limit, fn):
    """Pagination applies to the grouped rows BEFORE a second RETURN
    aggregation sees them: AGG over the WITH-created alias equals the
    Python aggregate of the sliced page."""
    df = cypher(
        g["t"],
        f"""
        MATCH (caller:Function)-[:CALLS]->(callee:Function)
        WITH caller.name AS caller, count(*) AS n
        ORDER BY n DESC, caller ASC
        SKIP {skip} LIMIT {limit}
        RETURN {fn}(n) AS val, count(*) AS n_rows
        """,
    )
    row = df.collect()[0]
    page = sorted(
        ((k, len(v)) for k, v in _ref_groups(g).items()),
        key=lambda kv: (-kv[1], kv[0]),
    )[skip : skip + limit]
    vals = [n for _, n in page]
    if not vals:
        # Cypher global aggregation over zero rows: one row, NULL
        # sum/min/max/avg, count 0 (Neo4j semantics)
        assert row["n_rows"] == 0 and row["val"] is None
    else:
        assert row["n_rows"] == len(vals)
        assert row["val"] == _ref_agg(fn, vals)


def test_having_via_with_where(g):
    """WITH + WHERE over an aggregate alias is HAVING: only groups past
    the threshold survive into RETURN."""
    df = cypher(
        g["t"],
        """
        MATCH (caller:Function)-[:CALLS]->(callee:Function)
        WITH caller.name AS caller, count(*) AS n
        WHERE n > 1
        RETURN caller, n
        ORDER BY caller
        """,
    )
    got = [(r["caller"], r["n"]) for r in df.collect()]
    want = sorted(
        (k, len(v)) for k, v in _ref_groups(g).items() if len(v) > 1
    )
    assert got == want
