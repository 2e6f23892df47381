"""Differential fuzz: compiled Cypher vs the native traverse operators
vs an independent pure-Python rel-unique path enumerator, on random
graphs WITH self-loops and cycles (hypothesis-drawn edge sets).

Three independent implementations of the same Neo4j semantics exist in
the repo — the Cypher compiler's per-path plan (cypher.py _compile_path /
_varlen_paths), the native operators (operators/traverse.py
enumerate_paths G3 / indirect_recursion G7), and the DISTINCT-pairs fast
path (_varlen_pairs, lo == 1 only).  Any divergence is a real bug one
engine has (the r4 advice found exactly one: walk-endpoints != path-
endpoints at lo >= 2).
"""

from __future__ import annotations

import os
import sys
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.cypher import cypher
from binaryx_graph_spark.operators.traverse import (
    enumerate_paths,
    indirect_recursion,
)

# ------------------------------------------------------ random graph gen

N_NODES = 6


@st.composite
def edge_sets(draw):
    """Random digraph on N_NODES nodes, self-loops included, (src, dst)
    deduped (the engines' per-type MERGE identity collapses parallels)."""
    n_edges = draw(st.integers(2, 14))
    edges = draw(
        st.sets(
            st.tuples(
                st.integers(0, N_NODES - 1), st.integers(0, N_NODES - 1)
            ),
            min_size=n_edges,
            max_size=n_edges,
        )
    )
    return sorted(edges)


def _tables(spark, edges):
    """Minimal graph_tables dict: Function nodes + CALLS edges (the only
    tables a :CALLS-pattern query touches)."""
    nodes = sorted({v for e in edges for v in e})
    fns = spark.createDataFrame(
        [(str(v), f"fn{v}", f"0x{v:x}", -1, "Internal") for v in nodes],
        "uid string, name string, address string, size long, type string",
    )
    calls = spark.createDataFrame(
        [(str(s), str(d), f"0x{i:x}", "Direct") for i, (s, d) in enumerate(edges)],
        "src_uid string, dst_uid string, offset string, call_type string",
    )
    return {"functions": fns, "calls": calls}, fns, calls


# ------------------------------------------- reference path enumerator


def ref_paths(edges, lo, hi, *, starts=None):
    """All relationship-unique :CALLS paths with length in [lo, hi] as a
    Counter of node-key tuples (one entry per path)."""
    out: Counter = Counter()
    nodes = sorted({v for e in edges for v in e})

    def dfs(path, used):
        depth = len(path) - 1
        if depth >= lo:
            out[tuple(str(v) for v in path)] += 1
        if depth == hi:
            return
        for s, d in edges:
            if s == path[-1] and (s, d) not in used:
                dfs(path + [d], used | {(s, d)})

    for v in nodes if starts is None else starts:
        dfs([v], frozenset())
    return out


# ------------------------------------------------------------- the tests


@settings(max_examples=20, deadline=None)
@given(edge_sets(), st.integers(2, 3), st.integers(0, 1))
def test_distinct_endpoints_lo2_match_rel_unique_paths(spark, edges, lo, extra):
    """The r4-advice bug class: DISTINCT consumers over *lo..hi with
    lo >= 2 must see RELATIONSHIP-UNIQUE path endpoints, not walk
    endpoints (a lone self-loop has a length-2 walk but no path)."""
    hi = lo + extra
    t, _fns, _calls = _tables(spark, edges)
    q = (
        f"MATCH (a:Function)-[:CALLS*{lo}..{hi}]->(b:Function) "
        f"RETURN DISTINCT a.uid AS a, b.uid AS b"
    )
    got = {(r["a"], r["b"]) for r in cypher(t, q).collect()}
    want = {(p[0], p[-1]) for p in ref_paths(edges, lo, hi)}
    assert got == want, f"edges={edges} *{lo}..{hi}"


@settings(max_examples=12, deadline=None)
@given(edge_sets(), st.integers(1, 3))
def test_distinct_endpoints_lo1_fast_path_sound(spark, edges, hi):
    """lo == 1 keeps the DISTINCT-pairs fast path — walk endpoints and
    path endpoints coincide there; pin that equivalence on random
    graphs so the gate condition stays honest."""
    t, _fns, _calls = _tables(spark, edges)
    q = (
        f"MATCH (a:Function)-[:CALLS*1..{hi}]->(b:Function) "
        f"RETURN DISTINCT a.uid AS a, b.uid AS b"
    )
    got = {(r["a"], r["b"]) for r in cypher(t, q).collect()}
    want = {(p[0], p[-1]) for p in ref_paths(edges, 1, hi)}
    assert got == want, f"edges={edges} *1..{hi}"


@settings(max_examples=15, deadline=None)
@given(edge_sets(), st.integers(1, 2), st.integers(0, 1))
def test_compiled_per_path_vs_native_enumerate_vs_reference(
    spark, edges, lo, extra
):
    """G3 three-way: compiled `MATCH path = ...` one-row-per-path
    multiplicity == native enumerate_paths == pure-Python enumerator
    (node-sequence multisets; rel-unique rule on all three)."""
    hi = lo + extra
    t, fns, calls = _tables(spark, edges)
    want = ref_paths(edges, lo, hi)

    q = (
        f"MATCH path = (a:Function)-[:CALLS*{lo}..{hi}]->(b:Function) "
        f"RETURN [n in nodes(path) | n.uid] AS p"
    )
    compiled = Counter(tuple(r["p"]) for r in cypher(t, q).collect())
    assert compiled == want, f"compiled diverges: edges={edges} *{lo}..{hi}"

    # native G3 enumerates 1..hi from every seed; filter to >= lo
    seeds = fns.select("uid")
    native = Counter(
        tuple([r["start_uid"]] + list(r["node_names"])[1:])
        for r in enumerate_paths(calls, fns, seeds, max_depth=hi).collect()
        if r["path_length"] >= lo
    )
    # enumerate_paths carries names (fnN) — map reference to names
    want_names = Counter()
    for p, c in want.items():
        want_names[tuple([p[0]] + [f"fn{v}" for v in p[1:]])] = c
    assert native == want_names, f"native diverges: edges={edges} *{lo}..{hi}"


@settings(max_examples=20, deadline=None)
@given(edge_sets())
def test_compiled_cycles_vs_native_indirect_recursion(spark, edges):
    """G7 two-way: min cycle length in [2, 6] per origin — compiled
    cycle-shaped path pattern vs native indirect_recursion vs the
    reference enumerator.  Self-loops are the adversarial case: a loop
    walked twice is NOT a length-2 cycle."""
    t, fns, calls = _tables(spark, edges)
    q = (
        "MATCH path = (f:Function)-[:CALLS*2..6]->(f) "
        "RETURN f.uid AS uid, length(path) AS len"
    )
    compiled: dict[str, int] = {}
    for r in cypher(t, q).collect():
        u, ln = r["uid"], int(r["len"])
        compiled[u] = min(ln, compiled.get(u, 99))

    seeds = fns.select("uid")
    native = {
        r["uid"]: r["cycle_length"]
        for r in indirect_recursion(calls, seeds, max_depth=6).collect()
    }

    want: dict[str, int] = {}
    for p, _c in ref_paths(edges, 2, 6).items():
        if p[0] == p[-1]:
            want[p[0]] = min(len(p) - 1, want.get(p[0], 99))

    assert compiled == want, f"compiled cycles diverge: edges={edges}"
    assert native == want, f"native cycles diverge: edges={edges}"


@settings(max_examples=15, deadline=None)
@given(edge_sets())
def test_compiled_shortest_path_vs_reference(spark, edges):
    """shortestPath(): ONE row per reachable (a,b) pair with 1 <= dist
    <= 4, length == BFS min distance, node sequence == the
    lexicographically smallest among min-length paths (the compiler's
    documented deterministic strengthening of Neo4j's arbitrary pick)."""
    t, _fns, _calls = _tables(spark, edges)
    q = (
        "MATCH p = shortestPath((a:Function)-[:CALLS*1..4]->(b:Function)) "
        "RETURN a.uid AS a, b.uid AS b, [n in nodes(p) | n.uid] AS names, length(p) AS len"
    )
    rows = cypher(t, q).collect()
    got = {(r["a"], r["b"]): (int(r["len"]), tuple(r["names"])) for r in rows}
    assert len(rows) == len(got), f"duplicate (a,b) rows: edges={edges}"

    # reference: BFS min distance per ordered pair (a != b — the
    # compiler, like Neo4j, never reports a zero- or cycle-length
    # shortestPath back to the start), then the lexicographically
    # smallest path of exactly that length via lex-ordered DFS
    nodes = sorted({str(v) for e in edges for v in e})
    adj: dict[str, list[str]] = {v: [] for v in nodes}
    for s, d in edges:
        adj[str(s)].append(str(d))
    for v in adj:
        adj[v].sort()

    def lex_path(a, b, dmin):
        best = None

        def dfs(u, path):
            nonlocal best
            if best is not None:
                return
            if len(path) - 1 == dmin:
                if path[-1] == b:
                    best = tuple(path)
                return
            for w in adj[u]:
                dfs(w, path + [w])

        dfs(a, [a])
        return best

    want = {}
    for a in nodes:
        dist = {a: 0}
        frontier = [a]
        for depth in range(1, 5):
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in dist:
                        dist[w] = depth
                        nxt.append(w)
            frontier = nxt
        for b in nodes:
            if b != a and b in dist and 1 <= dist[b] <= 4:
                want[(a, b)] = (dist[b], lex_path(a, b, dist[b]))
    assert got == want, f"edges={edges}"


@settings(max_examples=12, deadline=None)
@given(edge_sets())
def test_compiled_exists_vs_reference(spark, edges):
    """J2 surface: EXISTS((a)-[:CALLS]->(b)) over the (a, b) cross
    product — exactly the distinct edge set, one row per pair (the
    membership-filter shape the reference embeds,
    call_path_analyzer.rs ALL/EXISTS clause)."""
    t, _fns, _calls = _tables(spark, edges)
    q = (
        "MATCH (a:Function) MATCH (b:Function) "
        "WHERE EXISTS((a)-[:CALLS]->(b)) "
        "RETURN a.uid AS a, b.uid AS b"
    )
    got = sorted((r["a"], r["b"]) for r in cypher(t, q).collect())
    want = sorted({(str(s), str(d)) for s, d in edges})
    assert got == want, f"edges={edges}"


@settings(max_examples=12, deadline=None)
@given(edge_sets(), st.integers(1, 2), st.booleans())
def test_with_pipeline_aggregate_having_vs_reference(spark, edges, thresh, rev):
    """WITH-pipeline: implicit grouping + aggregate + HAVING-style WHERE
    on the horizon, then projection — out-degree (or in-degree) counts
    per node vs a pure-Python Counter.  Duplicate (src,dst) edges are
    collapsed upstream, so count(b) is the distinct-neighbor degree."""
    t, _fns, _calls = _tables(spark, edges)
    arrow = "<-[:CALLS]-" if rev else "-[:CALLS]->"
    q = (
        f"MATCH (a:Function){arrow}(b:Function) "
        f"WITH a, count(b) AS d WHERE d >= {thresh} "
        f"RETURN a.uid AS a, d ORDER BY d DESC, a"
    )
    got = [(r["a"], r["d"]) for r in cypher(t, q).collect()]
    deg = Counter()
    for s, d in edges:
        deg[str(d) if rev else str(s)] += 1
    want = sorted(
        ((v, c) for v, c in deg.items() if c >= thresh),
        key=lambda vc: (-vc[1], vc[0]),
    )
    assert got == want, f"edges={edges} thresh={thresh} rev={rev}\n{q}"


@settings(max_examples=10, deadline=None)
@given(edge_sets())
def test_call_union_vs_reference(spark, edges):
    """CALL { q1 UNION q2 }: Cypher UNION (no ALL) dedups — callers ∪
    callees == the node set touched by any edge, exactly once each."""
    t, _fns, _calls = _tables(spark, edges)
    q = (
        "CALL { MATCH (a:Function)-[:CALLS]->(b:Function) RETURN a.uid AS x "
        "UNION MATCH (c:Function)-[:CALLS]->(d:Function) RETURN d.uid AS x } "
        "RETURN x ORDER BY x"
    )
    got = [r["x"] for r in cypher(t, q).collect()]
    want = sorted({str(v) for e in edges for v in e})
    assert got == want, f"edges={edges}"


@settings(max_examples=10, deadline=None)
@given(edge_sets())
def test_collect_aggregate_vs_reference(spark, edges):
    """collect(b.uid) per caller (sorted-for-determinism contract) ==
    the sorted adjacency list, with per-edge MULTIPLICITY (collect is a
    bag, deduped (src,dst) here so each neighbor once)."""
    t, _fns, _calls = _tables(spark, edges)
    q = (
        "MATCH (a:Function)-[:CALLS]->(b:Function) "
        "RETURN a.uid AS a, collect(b.uid) AS cs ORDER BY a"
    )
    got = [(r["a"], list(r["cs"])) for r in cypher(t, q).collect()]
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        adj.setdefault(str(s), []).append(str(d))
    want = [(a, sorted(v)) for a, v in sorted(adj.items())]
    assert got == want, f"edges={edges}"


@settings(max_examples=10, deadline=None)
@given(edge_sets(), st.integers(0, 3), st.integers(1, 4))
def test_skip_limit_pagination_vs_reference(spark, edges, skip, limit):
    """SKIP/LIMIT over a totally-ordered projection == python slicing."""
    t, _fns, _calls = _tables(spark, edges)
    q = (
        "MATCH (a:Function)-[:CALLS]->(b:Function) "
        f"RETURN a.uid AS a, b.uid AS b ORDER BY a, b SKIP {skip} LIMIT {limit}"
    )
    got = [(r["a"], r["b"]) for r in cypher(t, q).collect()]
    allrows = sorted((str(s), str(d)) for s, d in edges)
    assert got == allrows[skip : skip + limit], f"edges={edges} skip={skip} limit={limit}"
