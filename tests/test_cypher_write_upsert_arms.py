"""Neo4j's conditional MERGE arms — ON CREATE SET / ON MATCH SET,
SET += $map, REMOVE — through both write lanes (single-statement
cypher_write and the set-oriented cypher_write_batch).

The reference's templates never use these (importer.rs issues plain
MERGE/SET), but they are THE canonical real-world Neo4j upsert idiom;
semantics are pinned against Neo4j's documented behavior: the arm
matching each row's fate applies, plain SET applies to both, REMOVE
nulls on either fate, += merges a property map non-destructively.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from binaryx_graph_spark.cypher import cypher_write, cypher_write_batch
from binaryx_graph_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.initialize()
    return w


UPSERT = """
    MERGE (f:Function {uid: $uid})
    ON CREATE SET f.name = $name, f.type = 'Fresh'
    ON MATCH SET f.type = 'Seen'
    SET f.size = $size
"""


def _fn(wh, uid):
    rows = (
        wh.read("functions").filter(F.col("uid") == uid).collect()
    )
    assert len(rows) == 1
    return rows[0]


def test_on_create_vs_on_match_single(spark, wh):
    cypher_write(wh, UPSERT, params={"uid": "u1", "name": "alpha", "size": 10})
    r = _fn(wh, "u1")
    # created: ON CREATE arm + plain SET applied
    assert (r["name"], r["type"], r["size"]) == ("alpha", "Fresh", 10)
    cypher_write(wh, UPSERT, params={"uid": "u1", "name": "IGNORED", "size": 20})
    r = _fn(wh, "u1")
    # matched: ON MATCH arm + plain SET; ON CREATE's name NOT re-applied
    assert (r["name"], r["type"], r["size"]) == ("alpha", "Seen", 20)


def test_on_create_vs_on_match_batch_set_oriented(spark, wh):
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f.name = $name, f.type = 'Old'",
        params={"uid": "u9", "name": "kept"},
    )
    params = spark.createDataFrame(
        [("u9", "IGNORED", 99), ("u10", "fresh10", 5), ("u11", "fresh11", 6)],
        "uid string, name string, size long",
    )
    r = cypher_write_batch(wh, UPSERT, params)
    assert r == {"table": "functions", "rows": 3}
    r9, r10 = _fn(wh, "u9"), _fn(wh, "u10")
    assert (r9["name"], r9["type"], r9["size"]) == ("kept", "Seen", 99)
    assert (r10["name"], r10["type"], r10["size"]) == ("fresh10", "Fresh", 5)
    # the classic counter idiom: same prop in both arms, batch lane
    both = """
        MERGE (f:Function {uid: $uid})
        ON CREATE SET f.size = 1
        ON MATCH SET f.size = $size
    """
    params2 = spark.createDataFrame(
        [("u10", 100), ("u12", 100)], "uid string, size long"
    )
    cypher_write_batch(wh, both, params2)
    assert _fn(wh, "u10")["size"] == 100  # matched arm
    assert _fn(wh, "u12")["size"] == 1  # created arm
    assert _fn(wh, "u12")["name"] is None


def test_set_plus_equals_map(spark, wh):
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f += $props",
        params={"uid": "m1", "props": {"name": "mapped", "size": 7}},
    )
    r = _fn(wh, "m1")
    assert (r["name"], r["size"]) == ("mapped", 7)
    # non-destructive: a second += with a different subset keeps name
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f += $props",
        params={"uid": "m1", "props": {"size": 8}},
    )
    r = _fn(wh, "m1")
    assert (r["name"], r["size"]) == ("mapped", 8)
    # the batch template lane cannot bind per-row maps: loud, not wrong
    with pytest.raises(ValueError, match="bound map value"):
        cypher_write_batch(
            wh,
            "MERGE (f:Function {uid: $uid}) SET f += $props",
            spark.createDataFrame([("x",)], "uid string"),
        )


def test_remove_nulls_property(spark, wh):
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f.name = $name, f.size = $size",
        params={"uid": "r1", "name": "gone-soon", "size": 3},
    )
    cypher_write(
        wh, "MERGE (f:Function {uid: $uid}) REMOVE f.name", params={"uid": "r1"}
    )
    r = _fn(wh, "r1")
    assert r["name"] is None and r["size"] == 3
    # batch REMOVE, mixed with an arm
    stmt = """
        MERGE (f:Function {uid: $uid})
        ON CREATE SET f.type = 'Fresh'
        REMOVE f.size
    """
    params = spark.createDataFrame([("r1",), ("r2",)], "uid string")
    cypher_write_batch(wh, stmt, params)
    assert _fn(wh, "r1")["size"] is None  # matched row: REMOVE applied
    assert _fn(wh, "r2")["type"] == "Fresh" and _fn(wh, "r2")["size"] is None


def test_edge_merge_arms(spark, wh):
    for uid in ("e1", "e2"):
        cypher_write(
            wh,
            "MERGE (f:Function {uid: $uid}) SET f.name = $uid",
            params={"uid": uid},
        )
    stmt = """
        MATCH (a:Function {uid: $src}), (b:Function {uid: $dst})
        MERGE (a)-[r:CALLS]->(b)
        ON CREATE SET r.call_type = 'first'
        ON MATCH SET r.call_type = $n
    """
    cypher_write(wh, stmt, params={"src": "e1", "dst": "e2", "n": "repeat"})
    row = wh.read("calls").collect()
    assert len(row) == 1 and row[0]["call_type"] == "first"
    cypher_write(wh, stmt, params={"src": "e1", "dst": "e2", "n": "repeat"})
    row = wh.read("calls").collect()
    assert len(row) == 1 and row[0]["call_type"] == "repeat"


def test_conflicting_and_forbidden_clauses_raise(spark, wh):
    with pytest.raises(ValueError, match="both"):
        cypher_write(
            wh,
            "MERGE (f:Function {uid: $u}) SET f.name = 'a' ON MATCH SET f.name = 'b'",
            params={"u": "x"},
        )
    with pytest.raises(ValueError, match="merge key"):
        cypher_write(
            wh,
            "MERGE (f:Function {uid: $u}) ON MATCH SET f.uid = 'z'",
            params={"u": "x"},
        )
    with pytest.raises(ValueError, match="both"):
        cypher_write(
            wh,
            "MERGE (f:Function {uid: $u}) SET f.size = 1 REMOVE f.size",
            params={"u": "x"},
        )
    with pytest.raises(ValueError, match="ON CREATE / ON MATCH"):
        cypher_write(
            wh, "MERGE (f:Function {uid: $u}) ON DELETE SET f.size = 1",
            params={"u": "x"},
        )


def test_upsert_arms_fuzz_rejects_cleanly():
    """Near-miss arm clauses must raise ValueError, never crash or
    silently parse — the r11 extension of the write-parser fuzz."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from binaryx_graph_spark.cypher import CypherWriteParser

    templates = [
        "MERGE (f:Function {{uid: $u}}) ON {arm} SET f.{prop} = $n",
        "MERGE (f:Function {{uid: $u}}) ON CREATE SET {var}.{prop} = $n",
        "MERGE (f:Function {{uid: $u}}) REMOVE {var}.{prop}",
        "MERGE (f:Function {{uid: $u}}) SET f += ${mapname}",
        "MERGE (f:Function {{uid: $u}}) ON CREATE SET f.{prop} = $n "
        "ON CREATE SET f.{prop} = $n",
        "MERGE (f:Function {{uid: $u}}) SET f.{prop} = $n REMOVE f.{prop}",
        "MERGE (f:Function {{uid: $u}}) ON CREATE f.{prop} = $n",
    ]

    @settings(max_examples=80, deadline=None)
    @given(
        st.sampled_from(templates),
        st.sampled_from(["CREATE", "MATCH", "DELETE", "MERGE", ""]),
        st.sampled_from(["name", "size", "uid", "nope"]),
        st.sampled_from(["f", "g", ""]),
        st.sampled_from(["props", "missing"]),
    )
    def run(tpl, arm, prop, var, mapname):
        text = tpl.format(arm=arm, prop=prop, var=var, mapname=mapname)
        params = {"u": "u1", "n": "x", "props": {"name": "a"}}
        try:
            CypherWriteParser(text, params).parse_write()
        except ValueError:
            pass  # loud rejection is the contract

    run()


def test_unwind_bulk_with_arms(spark, wh):
    """UNWIND $rows AS r composes with the conditional arms — one
    set-oriented merge, per-row fate."""
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f.name = $name, f.type = 'Old'",
        params={"uid": "w1", "name": "kept"},
    )
    cypher_write(
        wh,
        """
        UNWIND $rows AS r
        MERGE (f:Function {uid: r.uid})
        ON CREATE SET f.name = r.name, f.type = 'Fresh'
        ON MATCH SET f.type = 'Seen'
        SET f.size = r.size
        """,
        params={
            "rows": [
                {"uid": "w1", "name": "IGNORED", "size": 11},
                {"uid": "w2", "name": "fresh", "size": 22},
            ]
        },
    )
    r1, r2 = _fn(wh, "w1"), _fn(wh, "w2")
    assert (r1["name"], r1["type"], r1["size"]) == ("kept", "Seen", 11)
    assert (r2["name"], r2["type"], r2["size"]) == ("fresh", "Fresh", 22)


def test_counter_idiom_self_reference_set(spark, wh):
    """Neo4j's counter idiom: SET values may reference the variable's
    own stored properties (RHS evaluates against the OLD row)."""
    upsert = """
        MERGE (f:Function {uid: $uid})
        ON CREATE SET f.size = 1
        ON MATCH SET f.size = f.size + 1
    """
    for _ in range(3):
        cypher_write(wh, upsert, params={"uid": "ctr"})
    assert _fn(wh, "ctr")["size"] == 3
    # minus + param operand; plain copy; old-row semantics for pairs
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f.size = f.size - $n, f.name = f.type",
        params={"uid": "ctr", "n": 2},
    )
    r = _fn(wh, "ctr")
    assert r["size"] == 1 and r["name"] == r["type"]
    # NULL propagates (Neo4j: NULL + 1 IS NULL)
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) ON CREATE SET f.size = f.size + 1",
        params={"uid": "nullctr"},
    )
    assert _fn(wh, "nullctr")["size"] is None
    # unknown referenced property raises
    with pytest.raises(ValueError, match="no column"):
        cypher_write(
            wh,
            "MERGE (f:Function {uid: $uid}) SET f.size = f.nope + 1",
            params={"uid": "ctr"},
        )
    # the batch lane rejects self-references loudly
    with pytest.raises(ValueError, match="single-statement lane"):
        cypher_write_batch(
            wh,
            "MERGE (f:Function {uid: $uid}) ON MATCH SET f.size = f.size + 1",
            spark.createDataFrame([("ctr",)], "uid string"),
        )
