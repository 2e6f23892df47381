"""Every read query the reference issues, VERBATIM, through the Cypher
compiler.

Each string below is copied character-for-character from the reference's
Rust source (the `format!` depth placeholder instantiated the way the
reference does, with its own defaults), then executed against the
micro-graph fixture.  Assertions cross-check the results against the
hand-derived fixture facts the existing mg_* oracle queries pin — so a
reference user can paste their exact query text and get the same rows.

Sources:
- /root/reference/src/neo4j/importer.rs:37-73 (counts), 329-341 (search),
  386-400 (fulltext), 433-437 (binary info), 479-492 (callees),
  515-528 (callers), 554-575 (xref)
- /root/reference/src/neo4j/call_path_analyzer.rs:30-49 (paths),
  161-175 (frequency), 205-221 (sequences), 261-274 (direct recursion),
  293-310 (indirect recursion), 344-367 (upward), 442-459 (caller seqs)
- /root/reference/src/api/client.rs:98 (export)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.cypher import cypher
from binaryx_graph_spark.queries.ingest_demo import graph_tables


@pytest.fixture(scope="module")
def t(spark):
    return graph_tables(spark)


def rows(df):
    return [tuple(r) for r in df.collect()]


# ------------------------------------------------------------- importer.rs


def test_importer_count_queries(spark, t):
    """importer.rs:37-73 — the five get_stats counts."""
    cases = {
        "MATCH (b:Binary) RETURN count(b) as count": 2,
        "MATCH (f:Function) RETURN count(f) as count": 6,
        "MATCH (s:String) RETURN count(s) as count": 3,
        "MATCH (l:Library) RETURN count(l) as count": 1,
        "MATCH ()-[r:CALLS]->() RETURN count(r) as count": 5,
    }
    for q, want in cases.items():
        assert cypher(t, q).head()["count"] == want, q


def test_importer_function_search_scoped(spark, t):
    """importer.rs:329-334 — substring search inside one binary."""
    q = """
            MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)
            WHERE (f.name CONTAINS $pattern OR f.uid CONTAINS $pattern)
              AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
            RETURN f
            LIMIT 100
        """
    got = cypher(t, q, params={"pattern": "elp", "binary_name": "mal_a"})
    assert [r["f_name"] for r in got.collect()] == ["helper"]


def test_importer_function_search_global(spark, t):
    """importer.rs:337-341 — global substring search."""
    q = """
            MATCH (f:Function)
            WHERE f.name CONTAINS $pattern OR f.uid CONTAINS $pattern
            RETURN f
            LIMIT 100
        """
    got = cypher(t, q, params={"pattern": "worker"})
    assert [r["f_name"] for r in got.collect()] == ["worker"]


def test_importer_fulltext_scoped_and_global(spark, t):
    """importer.rs:385-400 — fulltext CALL, scoped and global."""
    scoped = """
            CALL db.index.fulltext.queryNodes('string_value_fulltext', $query) YIELD node, score
            MATCH (b:Binary)-[:CONTAINS_STRING]->(node)
            WHERE (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
            RETURN node AS s, score AS score, count(DISTINCT b) AS sample_count
            ORDER BY score DESC
            LIMIT $limit
        """
    got = cypher(t, scoped, params={"query": "Bitcoin", "binary_name": "mal_a", "limit": 10})
    r = got.collect()
    assert len(r) == 1 and r[0]["s_value"] == "Pay Bitcoin" and r[0]["sample_count"] == 1

    global_q = """
            CALL db.index.fulltext.queryNodes('string_value_fulltext', $query) YIELD node, score
            MATCH (b:Binary)-[:CONTAINS_STRING]->(node)
            RETURN node AS s, score AS score, count(DISTINCT b) AS sample_count
            ORDER BY score DESC
            LIMIT $limit
        """
    r = cypher(t, global_q, params={"query": "Bitcoin", "limit": 10}).collect()
    assert len(r) == 1 and r[0]["sample_count"] == 2  # shared string, both binaries


def test_importer_binary_info(spark, t):
    """importer.rs:432-437 — binary lookup LIMIT 1."""
    q = """
            MATCH (b:Binary)
            WHERE b.hash = $binary_name OR b.filename CONTAINS $binary_name
            RETURN b
            LIMIT 1
        """
    r = cypher(t, q, params={"binary_name": "mal_a"}).collect()
    assert len(r) == 1 and r[0]["b_filename"] == "mal_a.exe"


def test_importer_callees_scoped_exists(spark, t):
    """importer.rs:479-483 — scoped callees with the EXISTS filter."""
    q = (
        "MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)-[:CALLS*1..3]->(callee:Function)\n"
        "                 WHERE (f.name = $function_name OR f.uid = $function_name)\n"
        "                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)\n"
        "                   AND EXISTS((b)-[:CONTAINS|IMPORTS]->(callee))\n"
        "                 RETURN DISTINCT callee"
    )
    got = cypher(t, q, params={"function_name": "main", "binary_name": "mal_a"})
    assert sorted(r["callee_name"] for r in got.collect()) == [
        "CreateFileA", "helper", "worker",
    ]


def test_importer_callees_global(spark, t):
    """importer.rs:487-492 — global callees."""
    q = (
        "MATCH (f:Function)-[:CALLS*1..3]->(callee:Function)\n"
        "                 WHERE f.name = $function_name OR f.uid = $function_name\n"
        "                 RETURN DISTINCT callee"
    )
    got = cypher(t, q, params={"function_name": "main"})
    assert sorted(r["callee_name"] for r in got.collect()) == [
        "CreateFileA", "helper", "worker",
    ]


def test_importer_callers_scoped_reverse_varlen(spark, t):
    """importer.rs:514-519 — scoped callers via the REVERSE varlen arrow."""
    q = (
        "MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)<-[:CALLS*1..3]-(caller:Function)\n"
        "                 WHERE (f.name = $function_name OR f.uid = $function_name)\n"
        "                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)\n"
        "                   AND EXISTS((b)-[:CONTAINS|IMPORTS]->(caller))\n"
        "                 RETURN DISTINCT caller"
    )
    got = cypher(t, q, params={"function_name": "worker", "binary_name": "mal_a"})
    assert sorted(r["caller_name"] for r in got.collect()) == ["helper", "main", "worker"]


def test_importer_callers_global(spark, t):
    """importer.rs:523-528 — global callers (the reference flips to a
    forward arrow in this variant)."""
    q = (
        "MATCH (caller:Function)-[:CALLS*1..3]->(f:Function)\n"
        "                 WHERE f.name = $function_name OR f.uid = $function_name\n"
        "                 RETURN DISTINCT caller"
    )
    got = cypher(t, q, params={"function_name": "worker"})
    assert sorted(r["caller_name"] for r in got.collect()) == ["helper", "main", "worker"]


def test_importer_xref_call_union(spark, t):
    """importer.rs:553-570 — the CALL { ... UNION ... } xref query."""
    q = """
            CALL {
                MATCH (b:Binary)
                WHERE (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                MATCH (b)-[:CONTAINS|IMPORTS]->(from:Function)-[r:CALLS]->(to:Function)
                WHERE (from.address = $address OR to.address = $address)
                RETURN from.name as from_function, to.name as to_function, r.offset as offset
                UNION
                MATCH (b:Binary)
                WHERE (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                MATCH (b)-[:CONTAINS|IMPORTS]->(from:Function)-[r:CALLS]->(to:Function)
                MATCH (b)-[imp:IMPORTS]->(to:Function)
                WHERE imp.address = $address
                RETURN from.name as from_function, to.name as to_function, r.offset as offset
            }
            RETURN DISTINCT from_function, to_function, offset
        """
    got = cypher(t, q, params={"binary_name": "mal_a", "address": "0x401100"})
    assert sorted(rows(got)) == [
        ("helper", "worker", "0x401110"),
        ("main", "helper", "0x401010"),
        ("worker", "helper", "0x401210"),
    ]


def test_importer_xref_global(spark, t):
    """importer.rs:573-575 — the no-binary xref variant."""
    q = """
            MATCH (from:Function)-[r:CALLS]->(to:Function)
            WHERE from.address = $address OR to.address = $address
            RETURN from.name as from_function, to.name as to_function, r.offset as offset
        """
    got = cypher(t, q, params={"address": "0x401100"})
    assert sorted(rows(got)) == [
        ("helper", "worker", "0x401110"),
        ("main", "helper", "0x401010"),
        ("worker", "helper", "0x401210"),
    ]


# --------------------------------------------------- call_path_analyzer.rs


PATH_RETURN = """RETURN path, length(path) as path_length,
                        [node in nodes(path) | node.name] as node_names,
                        [node in nodes(path) | node.address] as node_addresses,
                        [rel in relationships(path) | rel.offset] as call_offsets"""


def test_paths_scoped(spark, t):
    """call_path_analyzer.rs:30-38 — the flagship scoped path query."""
    q = (
        "MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(start:Function)\n"
        "                 MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)\n"
        "                 WHERE (start.name = $function_name OR start.uid = $function_name)\n"
        "                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)\n"
        "                   AND ALL(n IN nodes(path) WHERE EXISTS((b)-[:CONTAINS|IMPORTS]->(n)))\n"
        f"                 {PATH_RETURN}"
    )
    got = cypher(t, q, params={"function_name": "main", "binary_name": "mal_a"}).collect()
    # matches the pinned mg_paths_from_main expectation: 5 paths from main
    assert len(got) == 5
    by_names = {tuple(r["node_names"]): r for r in got}
    assert ("main", "helper") in by_names
    r = by_names[("main", "helper")]
    assert r["path_length"] == 1
    assert r["node_addresses"] == ["0x401000", "0x401100"]
    assert r["call_offsets"] == ["0x401010"]
    # a length-3 path exists and paths never reuse a CALLS edge
    assert max(r["path_length"] for r in got) == 3
    for r in got:
        edges = list(zip(r["node_names"], r["node_names"][1:]))
        assert len(edges) == len(set(edges))


def test_paths_global(spark, t):
    """call_path_analyzer.rs:43-49 — unscoped path query."""
    q = (
        "MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)\n"
        "                 WHERE start.name = $function_name OR start.uid = $function_name\n"
        f"                 {PATH_RETURN}"
    )
    got = cypher(t, q, params={"function_name": "main"}).collect()
    assert len(got) == 5


def test_call_frequency(spark, t):
    """call_path_analyzer.rs:161-175 — per-callee frequency, both arms."""
    scoped = """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(caller:Function)-[:CALLS]->(callee:Function)
                 WHERE (caller.name = $function_name OR caller.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND EXISTS((b)-[:CONTAINS|IMPORTS]->(callee))
                 RETURN callee.name as callee_name, count(*) as frequency"""
    got = cypher(t, scoped, params={"function_name": "main", "binary_name": "mal_a"})
    assert sorted(rows(got)) == [("CreateFileA", 1), ("helper", 1)]

    global_q = """MATCH (caller:Function)-[:CALLS]->(callee:Function)
                 WHERE caller.name = $function_name OR caller.uid = $function_name
                 RETURN callee.name as callee_name, count(*) as frequency"""
    got = cypher(t, global_q, params={"function_name": "main"})
    assert sorted(rows(got)) == [("CreateFileA", 1), ("helper", 1)]


def test_call_sequences(spark, t):
    """call_path_analyzer.rs:205-221 — offset-ordered call sites."""
    q = """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)-[r:CALLS]->(callee:Function)
                 WHERE (f.name = $function_name OR f.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND EXISTS((b)-[:CONTAINS|IMPORTS]->(callee))
                 RETURN f.name as caller, callee.name as callee, r.offset as call_site
                 ORDER BY r.offset"""
    got = cypher(t, q, params={"function_name": "main", "binary_name": "mal_a"})
    assert rows(got) == [("main", "helper", "0x401010"), ("main", "CreateFileA", "0x401020")]

    global_q = """MATCH (f:Function)-[r:CALLS]->(callee:Function)
                 WHERE f.name = $function_name OR f.uid = $function_name
                 RETURN f.name as caller, callee.name as callee, r.offset as call_site
                 ORDER BY r.offset"""
    got = cypher(t, global_q, params={"function_name": "main"})
    assert rows(got) == [("main", "helper", "0x401010"), ("main", "CreateFileA", "0x401020")]


def test_direct_recursion(spark, t):
    """call_path_analyzer.rs:261-274 — the self-loop pattern, both arms."""
    scoped = """MATCH (b:Binary)-[:CONTAINS]->(f:Function)-[:CALLS]->(f)
                 WHERE (f.name = $function_name OR f.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                 RETURN f.name as function_name, f.address as address"""
    got = cypher(t, scoped, params={"function_name": "worker", "binary_name": "mal_a"})
    assert rows(got) == [("worker", "0x401200")]

    global_q = """MATCH (f:Function)-[:CALLS]->(f)
                 WHERE f.name = $function_name OR f.uid = $function_name
                 RETURN f.name as function_name, f.address as address"""
    got = cypher(t, global_q, params={"function_name": "worker"})
    assert rows(got) == [("worker", "0x401200")]


def test_indirect_recursion_cycles(spark, t):
    """call_path_analyzer.rs:293-310 — *2..10 cycle paths, both arms."""
    scoped = """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)
                 MATCH path = (f:Function)-[:CALLS*2..10]->(f)
                 WHERE (f.name = $function_name OR f.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND ALL(n IN nodes(path) WHERE EXISTS((b)-[:CONTAINS|IMPORTS]->(n)))
                 RETURN length(path) as depth, f.name as function_name, f.address as address,
                        [node in nodes(path) | node.name] as path_nodes"""
    got = cypher(t, scoped, params={"function_name": "worker", "binary_name": "mal_a"}).collect()
    # helper<->worker 2-cycle, plus the two 3-cycles via worker's self-loop
    depths = sorted(r["depth"] for r in got)
    assert depths == [2, 3, 3]
    shortest = min(got, key=lambda r: r["depth"])
    assert shortest["path_nodes"] == ["worker", "helper", "worker"]
    assert shortest["function_name"] == "worker" and shortest["address"] == "0x401200"

    global_q = """MATCH path = (f:Function)-[:CALLS*2..10]->(f)
                 WHERE f.name = $function_name OR f.uid = $function_name
                 RETURN length(path) as depth, f.name as function_name, f.address as address,
                        [node in nodes(path) | node.name] as path_nodes"""
    got = cypher(t, global_q, params={"function_name": "worker"}).collect()
    assert sorted(r["depth"] for r in got) == [2, 3, 3]


def test_upward_chains(spark, t):
    """call_path_analyzer.rs:344-367 — paths INTO a function, both arms."""
    scoped = (
        "MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(end:Function)\n"
        "                 MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)\n"
        "                 WHERE (end.name = $function_name OR end.uid = $function_name)\n"
        "                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)\n"
        "                   AND ALL(n IN nodes(path) WHERE EXISTS((b)-[:CONTAINS|IMPORTS]->(n)))\n"
        f"                 {PATH_RETURN}\n"
        "                 ORDER BY path_length"
    )
    got = cypher(t, scoped, params={"function_name": "worker", "binary_name": "mal_a"}).collect()
    assert got and got[0]["path_length"] == 1
    assert all(r["node_names"][-1] == "worker" for r in got)
    lens = [r["path_length"] for r in got]
    assert lens == sorted(lens)

    global_q = (
        "MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)\n"
        "                 WHERE end.name = $function_name OR end.uid = $function_name\n"
        f"                 {PATH_RETURN}\n"
        "                 ORDER BY path_length"
    )
    got2 = cypher(t, global_q, params={"function_name": "worker"}).collect()
    assert len(got2) >= len(got)


def test_caller_sequences(spark, t):
    """call_path_analyzer.rs:442-459 — who calls f, offset-ordered."""
    q = """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(caller:Function)-[r:CALLS]->(callee:Function)
                 WHERE (callee.name = $function_name OR callee.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND EXISTS((b)-[:CONTAINS|IMPORTS]->(callee))
                 RETURN caller.name as caller_name, caller.address as caller_address,
                        r.offset as call_site, callee.name as callee_name, callee.address as callee_address
                 ORDER BY r.offset"""
    got = cypher(t, q, params={"function_name": "helper", "binary_name": "mal_a"})
    assert [(r["caller_name"], r["call_site"]) for r in got.collect()] == [
        ("main", "0x401010"), ("worker", "0x401210"),
    ]

    global_q = """MATCH (caller:Function)-[r:CALLS]->(callee:Function)
                 WHERE callee.name = $function_name OR callee.uid = $function_name
                 RETURN caller.name as caller_name, caller.address as caller_address,
                        r.offset as call_site, callee.name as callee_name, callee.address as callee_address
                 ORDER BY r.offset"""
    got = cypher(t, global_q, params={"function_name": "helper"})
    assert [(r["caller_name"], r["call_site"]) for r in got.collect()] == [
        ("main", "0x401010"), ("worker", "0x401210"),
    ]


# ------------------------------------------------------------ api/client.rs


def test_export_query(spark, t):
    """client.rs:98 — full-graph export."""
    q = "MATCH (n) OPTIONAL MATCH (n)-[r]->(m) RETURN n, type(r) as rel_type, m"
    got = cypher(t, q).collect()
    # every node appears at least once; isolated nodes carry NULL rel_type
    keys = {r["n_key"] for r in got}
    assert len(keys) == 12
    assert any(r["rel_type"] is None for r in got)


# ------------------------------------------------------- compiler contracts


def test_path_pushdown_prunes_seeds(spark, t):
    """The start-var WHERE conjunct is applied BEFORE enumeration (the
    pushdown Catalyst cannot do through a driver loop): with a never-
    matching start filter the result is empty without error."""
    q = (
        "MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)\n"
        "WHERE start.name = $function_name\n"
        "RETURN length(path) as path_length"
    )
    assert cypher(t, q, params={"function_name": "no_such_fn"}).count() == 0


def test_path_rejections(spark, t):
    for bad, params in [
        # ALL over an unknown path variable
        (
            "MATCH (b:Binary)-[:CONTAINS]->(f:Function) "
            "WHERE ALL(n IN nodes(p) WHERE EXISTS((b)-[:CONTAINS]->(n))) "
            "RETURN f.name AS n",
            None,
        ),
        # path pattern must be varlen CALLS
        ("MATCH p = (a:Function)-[:CALLS]->(b:Function) RETURN p", None),
        # EXISTS needs bound variables
        ("MATCH (f:Function) WHERE EXISTS((b)-[:CONTAINS]->(f)) RETURN f.name AS n", None),
        # comprehension over a non-path variable
        (
            "MATCH (f:Function) RETURN [n in nodes(f) | n.name] as xs",
            None,
        ),
    ]:
        with pytest.raises(ValueError):
            cypher(t, bad, params=params).collect()
