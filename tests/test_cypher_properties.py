"""Differential property tests for the Cypher compiler: hypothesis-
generated patterns evaluated both by the compiler (DataFrame plans) and
by an independent pure-Python graph interpreter over the collected
fixture tables.  Covers linear chains (direction, multi-type edges,
anonymous nodes, WHERE) and varlen path enumeration (per-path rows,
no-repeated-relationship rule)."""

from __future__ import annotations

import os
import sys
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.cypher import EDGE_TYPES, NODE_LABELS, cypher
from binaryx_graph_spark.queries.ingest_demo import graph_tables

# ------------------------------------------------- fixture graph snapshot


@pytest.fixture(scope="module")
def g(spark):
    t = graph_tables(spark)
    nodes = {}  # label -> {key -> row dict}
    for label, (table, key) in NODE_LABELS.items():
        nodes[label] = {r[key]: r.asDict() for r in t[table].collect()}
    edges = {}  # type -> list[(src_key, dst_key)]
    for ty, (table, _sl, sc, _dl, dc) in EDGE_TYPES.items():
        edges[ty] = [(r[sc], r[dc]) for r in t[table].collect()]
    return {"t": t, "nodes": nodes, "edges": edges}


# --------------------------------------------------- reference interpreter


def ref_chain(g, chain):
    """Evaluate a linear chain [(type, direction), ...] anchored on the
    type-implied labels; returns a multiset of (first_key, last_key)
    rows — one entry PER relationship combination (Cypher multiplicity).
    Direction '<-' means the pattern arrow points at the previous node."""
    # walk state: list of (first_key, cur_key); labels implied by types
    state = None
    for ty, direction in chain:
        pairs = g["edges"][ty]
        step = pairs if direction == "->" else [(d, s) for s, d in pairs]
        if state is None:
            state = [(s, d) for s, d in step]
        else:
            state = [(f, d) for f, c in state for s, d in step if s == c]
    return Counter(state)


def _chain_ok(chain):
    """A chain is well-formed when adjacent endpoint labels agree."""
    cur = None
    for ty, direction in chain:
        _t, sl, _sc, dl, _dc = EDGE_TYPES[ty]
        a, b = (sl, dl) if direction == "->" else (dl, sl)
        if cur is not None and cur != a:
            return False
        cur = b
    return True


EDGE_CHOICES = sorted(EDGE_TYPES)


@st.composite
def chains(draw):
    n = draw(st.integers(1, 3))
    chain = tuple(
        (draw(st.sampled_from(EDGE_CHOICES)), draw(st.sampled_from(["->", "<-"])))
        for _ in range(n)
    )
    return chain


@settings(max_examples=30, deadline=None)
@given(chains())
def test_linear_chain_matches_reference(spark, g, chain):
    if not _chain_ok(chain):
        return
    # build the Cypher text: (v0)-[:T]->(v1)-...  with anonymous middles
    parts = ["(v0)"]
    for i, (ty, direction) in enumerate(chain):
        arrow = f"-[:{ty}]->" if direction == "->" else f"<-[:{ty}]-"
        parts.append(arrow)
        parts.append(f"(v{i + 1})" if i == len(chain) - 1 else "()")
    first_ty, first_dir = chain[0]
    _t, sl, _sc, dl, _dc = EDGE_TYPES[first_ty]
    first_label = sl if first_dir == "->" else dl
    last_var = f"v{len(chain)}"
    q = (
        f"MATCH {''.join(parts)} "
        f"RETURN v0.key AS a, {last_var}.key AS b"
    )
    got = Counter((r["a"], r["b"]) for r in cypher(g["t"], q).collect())
    # normalize reference keys to strings like the key columns
    want = Counter((str(a), str(b)) for (a, b), c in ref_chain(g, chain).items() for _ in range(c))
    assert got == want, f"chain={chain}\nquery={q}"


# ----------------------------------------------------- varlen path rows


def ref_paths(g, lo, hi):
    """All :CALLS paths with length in [lo, hi], no repeated
    relationship (edge multiset — parallel (s,d) duplicates share the
    compiler's src→dst edge id, mirrored here by deduping pairs)."""
    edges = sorted(set(g["edges"]["CALLS"]))
    out = []

    def dfs(path_nodes, used):
        depth = len(path_nodes) - 1
        if depth >= lo:
            out.append(tuple(path_nodes))
        if depth == hi:
            return
        cur = path_nodes[-1]
        for s, d in edges:
            if s == cur and (s, d) not in used:
                dfs(path_nodes + [d], used | {(s, d)})

    for start in g["nodes"]["Function"]:
        dfs([start], frozenset())
    return Counter(out)


@settings(max_examples=12, deadline=None)
@given(st.integers(1, 3), st.integers(0, 2))
def test_varlen_paths_match_reference(spark, g, lo, extra):
    hi = lo + extra
    q = (
        f"MATCH path = (a:Function)-[:CALLS*{lo}..{hi}]->(b:Function) "
        f"RETURN path"
    )
    got = Counter(tuple(r["path"]) for r in cypher(g["t"], q).collect())
    want = ref_paths(g, lo, hi)
    assert got == want, f"*{lo}..{hi}"


# ------------------------------------------- OPTIONAL MATCH (r4 semantics)


def ref_optional(g, label, ty, mode, far_val):
    """Reference left-join semantics: per outer node, one row per arm
    match; NULL-extended single row when the (WHERE-filtered) arm is
    empty.  mode 'src'/'dst' anchors the outer var in the arm;
    'none' is the optional cartesian."""
    _t, sl, _sc, dl, _dc = EDGE_TYPES[ty]
    pairs = [(str(s), str(d)) for s, d in g["edges"][ty]]
    if far_val is not None:
        pairs = [(s, d) for s, d in pairs if d == far_val]
    rows = Counter()
    for o in (str(k) for k in g["nodes"][label]):
        if mode == "src":
            ms = [d for s, d in pairs if s == o]
        elif mode == "dst":
            ms = [s for s, d in pairs if d == o]
        else:
            ms = [s for s, _d in pairs]
        if ms:
            for m in ms:
                rows[(o, m)] += 1
        else:
            rows[(o, None)] += 1
    return rows


@st.composite
def optional_cases(draw):
    ty = draw(st.sampled_from(EDGE_CHOICES))
    _t, sl, _sc, dl, _dc = EDGE_TYPES[ty]
    mode = draw(st.sampled_from(["src", "dst", "none"]))
    label = {"src": sl, "dst": dl}.get(mode) or draw(
        st.sampled_from(sorted(NODE_LABELS))
    )
    filtered = draw(st.booleans()) and mode != "dst"
    return ty, label, mode, filtered


@settings(max_examples=25, deadline=None)
@given(optional_cases())
def test_optional_match_matches_reference(spark, g, case):
    ty, label, mode, filtered = case
    _t, sl, _sc, dl, _dc = EDGE_TYPES[ty]
    far_key = NODE_LABELS[dl][1]
    outer_key = NODE_LABELS[label][1]
    far_val = None
    if filtered:
        keys = sorted(str(k) for k in g["nodes"][dl]) + ["zz_no_such"]
        far_val = keys[hash((ty, label)) % len(keys)]  # deterministic pick
    where = f" WHERE x.{far_key} = '{far_val}'" if far_val is not None else ""
    if mode == "src":
        arm, ret_b = f"(o)-[:{ty}]->(x:{dl})", f"x.{far_key}"
    elif mode == "dst":
        arm, ret_b = f"(y:{sl})-[:{ty}]->(o)", f"y.{NODE_LABELS[sl][1]}"
    else:
        arm, ret_b = f"(y:{sl})-[:{ty}]->(x:{dl})", f"y.{NODE_LABELS[sl][1]}"
    q = (
        f"MATCH (o:{label}) OPTIONAL MATCH {arm}{where} "
        f"RETURN o.{outer_key} AS a, {ret_b} AS b"
    )
    got = Counter((r["a"], r["b"]) for r in cypher(g["t"], q).collect())
    want = ref_optional(g, label, ty, mode, far_val)
    assert got == want, f"case={case} val={far_val}\nquery={q}"
