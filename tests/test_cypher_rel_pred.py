"""Differential fuzz for ALL(r IN relationships(p) WHERE …) — the
relationship-property predicate in var-length patterns (the reference's
per-binary path variant, call_path_analyzer.rs:34).

Two independent oracles per random graph:
1. a pure-Python DFS path enumerator (no-repeated-relationship rule,
   node revisits allowed — the engine's documented multiplicity), run
   over the predicate-filtered edge subset;
2. the SAME Cypher query without the ALL, compiled over a pre-filtered
   calls table — the semantic identity the lowering claims
   (ALL-over-path ≡ edge-subset enumeration).
"""

from __future__ import annotations

import random

import pytest

from binaryx_graph_spark.cypher import cypher

CALL_TYPES = ["Direct", "Indirect", "Virtual", "Tail"]


def _tables(spark, edges):
    calls = spark.createDataFrame(
        [(s, d, f"0x{i:x}", t) for i, (s, d, t) in enumerate(edges)],
        "src_uid string, dst_uid string, offset string, call_type string",
    )
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    fns = spark.createDataFrame(
        [(u, u, "", -1, "Internal") for u in nodes],
        "uid string, name string, address string, size long, type string",
    )
    return {"functions": fns, "calls": calls}


def _py_paths(edges, seed, lo, hi):
    """All paths from `seed` of length lo..hi, repeated (src,dst)
    RELATIONSHIP forbidden within a path (parallel edges collapse to
    one identity — matching the engine's _eid = src→dst)."""
    adj: dict[str, set[str]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    out: list[tuple[str, ...]] = []

    def walk(node, path_nodes, used):
        depth = len(used)
        if lo <= depth <= hi:
            out.append(tuple(path_nodes))
        if depth == hi:
            return
        for nxt in sorted(adj.get(node, ())):
            eid = (node, nxt)
            if eid in used:
                continue
            walk(nxt, path_nodes + [nxt], used | {eid})

    walk(seed, [seed], frozenset())
    return sorted(out)


@pytest.mark.parametrize("trial", range(6))
def test_all_rel_pred_matches_python_and_prefiltered(spark, trial):
    rng = random.Random(1000 + trial)
    n_nodes = rng.randint(4, 8)
    nodes = [f"n{i}" for i in range(n_nodes)]
    n_edges = rng.randint(n_nodes, 3 * n_nodes)
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(n_edges)
        }
    )
    typed = [(s, d, rng.choice(CALL_TYPES)) for s, d in edges]
    lo, hi = 1, rng.randint(2, 4)
    seed = rng.choice(nodes)
    want_type = rng.choice(CALL_TYPES)

    q_pred = f"""MATCH p = (a:Function)-[:CALLS*{lo}..{hi}]->(b:Function)
        WHERE a.name = $seed
          AND ALL(r IN relationships(p) WHERE r.call_type = '{want_type}')
        RETURN [n IN nodes(p) | n.name] AS names"""
    t = _tables(spark, typed)
    got = sorted(tuple(r.names) for r in cypher(t, q_pred, params={"seed": seed}).collect())

    kept = [(s, d) for s, d, ty in typed if ty == want_type]
    assert got == _py_paths(kept, seed, lo, hi), f"trial {trial} vs python"

    # identity oracle #2: pre-filtered calls table, no ALL in the query
    t2 = _tables(spark, [(s, d, ty) for s, d, ty in typed if ty == want_type])
    q_plain = f"""MATCH p = (a:Function)-[:CALLS*{lo}..{hi}]->(b:Function)
        WHERE a.name = $seed
        RETURN [n IN nodes(p) | n.name] AS names"""
    got2 = sorted(tuple(r.names) for r in cypher(t2, q_plain, params={"seed": seed}).collect())
    assert got == got2, f"trial {trial} vs pre-filtered"


def test_all_rel_pred_compound_and_negated(spark):
    """AND / <> / NOT inside the ALL body compile against edge columns."""
    typed = [
        ("a", "b", "Direct"), ("b", "c", "Indirect"),
        ("a", "c", "Virtual"), ("c", "d", "Direct"), ("b", "d", "Tail"),
    ]
    t = _tables(spark, typed)
    q = """MATCH p = (a:Function)-[:CALLS*1..3]->(b:Function)
        WHERE a.name = 'a'
          AND ALL(r IN relationships(p)
                  WHERE r.call_type <> 'Indirect' AND NOT r.call_type = 'Tail')
        RETURN [n IN nodes(p) | n.name] AS names"""
    got = sorted(tuple(r.names) for r in cypher(t, q).collect())
    kept = [(s, d) for s, d, ty in typed if ty not in ("Indirect", "Tail")]
    assert got == _py_paths(kept, "a", 1, 3)


def test_all_rel_pred_rejects_unsupported_shapes(spark):
    t = _tables(spark, [("a", "b", "Direct")])
    base = "MATCH p = (a:Function)-[:CALLS*1..2]->(b:Function) WHERE {w} RETURN count(*) AS n"
    for w, frag in [
        ("ALL(r IN relationships(p) WHERE a.name = 'x')", "must test"),
        ("ALL(r IN relationships(p) WHERE r.call_type = a.name)", "literals only"),
        ("ALL(r IN relationships(q) WHERE r.call_type = 'Direct')", "unknown path"),
        ("ALL(r IN relationships(p) WHERE r.no_col = 'x')", "does not exist"),
        (
            "a.name = 'a' OR ALL(r IN relationships(p) WHERE r.call_type = 'Direct')",
            "top-level AND",
        ),
    ]:
        with pytest.raises(ValueError, match=frag):
            cypher(t, base.format(w=w)).collect()


@pytest.mark.parametrize("trial", range(4))
def test_all_rel_pred_in_and_param_forms(spark, trial):
    """r8 surface extension: IN [list], IN $param, = $param, and NOT IN
    inside the ALL body — same differential oracle as the '=' fuzz."""
    rng = random.Random(2000 + trial)
    n_nodes = rng.randint(4, 7)
    nodes = [f"n{i}" for i in range(n_nodes)]
    edges = list({(rng.choice(nodes), rng.choice(nodes)) for _ in range(3 * n_nodes)})
    typed = [(s, d, rng.choice(CALL_TYPES)) for s, d in edges]
    lo, hi = 1, rng.randint(2, 3)
    seed = rng.choice(nodes)
    want = rng.sample(CALL_TYPES, 2)
    t = _tables(spark, typed)

    def run(frag, extra):
        q = f"""MATCH p = (a:Function)-[:CALLS*{lo}..{hi}]->(b:Function)
            WHERE a.name = $seed AND ALL(r IN relationships(p) WHERE {frag})
            RETURN [n IN nodes(p) | n.name] AS names"""
        return sorted(
            tuple(r.names) for r in cypher(t, q, params={"seed": seed, **extra}).collect()
        )

    cases = [
        (f"r.call_type IN ['{want[0]}', '{want[1]}']", {}, lambda ty: ty in want),
        ("r.call_type IN $types", {"types": want}, lambda ty: ty in want),
        ("r.call_type = $ct", {"ct": want[0]}, lambda ty: ty == want[0]),
        ("r.call_type <> $ct", {"ct": want[0]}, lambda ty: ty != want[0]),
        ("NOT r.call_type IN $types", {"types": want}, lambda ty: ty not in want),
    ]
    for frag, extra, keep in cases:
        kept = [(s, d) for s, d, ty in typed if keep(ty)]
        assert run(frag, extra) == _py_paths(kept, seed, lo, hi), frag


def test_rel_pred_in_rejects_non_list_shapes(spark):
    t = _tables(spark, [("a", "b", "Direct")])
    base = (
        "MATCH p = (a:Function)-[:CALLS*1..2]->(b:Function) "
        "WHERE ALL(r IN relationships(p) WHERE {w}) RETURN count(*) AS n"
    )
    # $param bound to a scalar, not a list
    with pytest.raises(ValueError, match="IN expects a list"):
        cypher(t, base.format(w="r.call_type IN $types"), params={"types": "Direct"})
    # list element that is not a scalar literal
    with pytest.raises(ValueError, match="expected literal"):
        cypher(t, base.format(w="r.call_type IN [a.name]"))
    # nested list via param
    with pytest.raises(ValueError, match="IN expects a list"):
        cypher(t, base.format(w="r.call_type IN $types"), params={"types": [["x"]]})


def test_node_where_in_list(spark):
    """IN also composes in the plain WHERE surface (node properties)."""
    t = _tables(spark, [("a", "b", "Direct"), ("b", "c", "Tail"), ("c", "d", "Virtual")])
    q = """MATCH (a:Function)-[:CALLS]->(b:Function)
        WHERE b.name IN ['b', 'd'] RETURN a.name AS src, b.name AS dst"""
    got = sorted((r.src, r.dst) for r in cypher(t, q).collect())
    assert got == [("a", "b"), ("c", "d")]
