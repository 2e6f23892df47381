"""Set-oriented Cypher write batches + the verbatim import replay.

The headline invariant: replaying the reference's eleven importer
templates (importer.rs:86-320) through cypher_write_batch over the
client-session item streams produces BIT-IDENTICAL tables to
build_graph_tables' direct ETL — the Cypher lane and the DataFrame
lane share one source of truth and cannot drift."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.cypher import cypher_write, cypher_write_batch
from binaryx_graph_spark.operators.cypher_import import replay_reference_import
from binaryx_graph_spark.operators.ingest import build_graph_tables
from binaryx_graph_spark.sources.json_source import read_analysis_json
from binaryx_graph_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.initialize()
    return w


FN_TPL = """
    MERGE (f:Function {uid: $uid})
    SET f.name = $name,
        f.address = $address,
        f.type = $type,
        f.size = $size
"""


def _fn_params(spark, rows):
    return spark.createDataFrame(
        rows, "uid string, name string, address string, type string, size long, seq long"
    )


def test_batch_node_merge_lww_order(spark, wh):
    params = _fn_params(
        spark,
        [
            ("u1", "first", "0x1", "Internal", 10, 1),
            ("u2", "other", "0x2", "Internal", 20, 2),
            ("u1", "last", "0x1b", "Export", 11, 3),  # later statement wins
        ],
    )
    r = cypher_write_batch(wh, FN_TPL, params, order_cols=["seq"])
    assert r == {"table": "functions", "rows": 2}
    got = {
        row["uid"]: (row["name"], row["address"], row["type"], row["size"])
        for row in wh.read("functions").collect()
    }
    assert got == {
        "u1": ("last", "0x1b", "Export", 11),
        "u2": ("other", "0x2", "Internal", 20),
    }


def test_batch_partial_set_keeps_stored_columns(spark, wh):
    cypher_write(
        wh,
        FN_TPL,
        params={"uid": "u1", "name": "orig", "address": "0xa", "type": "Internal", "size": 7},
    )
    # template that only SETs name: unmentioned columns keep stored values
    params = spark.createDataFrame([("u1", "renamed", 1)], "uid string, name string, seq long")
    cypher_write_batch(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f.name = $name",
        params,
        order_cols=["seq"],
    )
    row = wh.read("functions").filter(F.col("uid") == "u1").head()
    assert (row["name"], row["address"], row["type"], row["size"]) == (
        "renamed", "0xa", "Internal", 7,
    )


def test_batch_edge_merge_match_precondition(spark, wh):
    cypher_write_batch(
        wh,
        FN_TPL,
        _fn_params(
            spark,
            [
                ("a", "fa", "0x1", "Internal", 1, 1),
                ("b", "fb", "0x2", "Internal", 2, 2),
            ],
        ),
        order_cols=["seq"],
    )
    calls = spark.createDataFrame(
        [
            ("a", "b", "0x10", "Direct", 1),
            ("a", "ghost", "0x20", "Direct", 2),  # missing endpoint: dropped
            ("a", "b", "0x30", "Tail", 3),  # LWW overwrite of (a,b)
        ],
        "from_uid string, to_uid string, offset string, call_type string, seq long",
    )
    r = cypher_write_batch(
        wh,
        """
        MATCH (from:Function {uid: $from_uid}), (to:Function {uid: $to_uid})
        MERGE (from)-[r:CALLS]->(to)
        SET r.offset = $offset, r.call_type = $call_type
        """,
        calls,
        order_cols=["seq"],
    )
    assert r == {"table": "calls", "rows": 1}
    assert [tuple(x) for x in wh.read("calls").collect()] == [
        ("a", "b", "0x30", "Tail")
    ]


def test_create_node_raises_on_existing_key(spark, wh):
    cypher_write(wh, "CREATE (l:Library {name: $n})", params={"n": "libc"})
    assert [r["name"] for r in wh.read("libraries").collect()] == ["libc"]
    with pytest.raises(ValueError, match="already exists"):
        cypher_write(wh, "CREATE (l:Library {name: $n})", params={"n": "libc"})
    # batch CREATE: collision detection is set-oriented
    with pytest.raises(ValueError, match="collides"):
        cypher_write_batch(
            wh,
            "CREATE (l:Library {name: $n})",
            spark.createDataFrame([("libc",), ("libm",)], "n string"),
        )


def test_create_index_verbatim_noop(wh):
    # schema.rs:44-51, verbatim
    for stmt in (
        "CREATE INDEX function_name_index IF NOT EXISTS FOR (f:Function) ON (f.name)",
        "CREATE FULLTEXT INDEX string_value_fulltext IF NOT EXISTS FOR (s:String) ON EACH [s.value]",
    ):
        assert cypher_write(wh, stmt) == {"table": "index", "rows": 0}


def test_keyed_detach_delete_removes_incident_edges(spark, wh):
    cypher_write_batch(
        wh,
        FN_TPL,
        _fn_params(
            spark,
            [("a", "fa", "0x1", "Internal", 1, 1), ("b", "fb", "0x2", "Internal", 2, 2)],
        ),
        order_cols=["seq"],
    )
    cypher_write(
        wh,
        """
        MATCH (from:Function {uid: $f}), (to:Function {uid: $t})
        MERGE (from)-[r:CALLS]->(to)
        SET r.offset = $o, r.call_type = $c
        """,
        params={"f": "a", "t": "b", "o": "0x10", "c": "Direct"},
    )
    # plain DELETE refuses while relationships exist (Neo4j constraint)
    with pytest.raises(ValueError, match="DETACH"):
        cypher_write(wh, "MATCH (f:Function {uid: $u}) DELETE f", params={"u": "a"})
    r = cypher_write(
        wh, "MATCH (f:Function {uid: $u}) DETACH DELETE f", params={"u": "a"}
    )
    assert r["rows"] == 2  # node + its CALLS edge
    assert wh.read("calls").count() == 0
    assert [x["uid"] for x in wh.read("functions").collect()] == ["b"]
    # now plain DELETE works on the edge-free node
    cypher_write(wh, "MATCH (f:Function {uid: $u}) DELETE f", params={"u": "b"})
    assert wh.read("functions").count() == 0


def test_edge_delete(spark, wh):
    cypher_write_batch(
        wh,
        FN_TPL,
        _fn_params(
            spark,
            [("a", "fa", "0x1", "Internal", 1, 1), ("b", "fb", "0x2", "Internal", 2, 2)],
        ),
        order_cols=["seq"],
    )
    cypher_write(
        wh,
        """
        MATCH (from:Function {uid: $f}), (to:Function {uid: $t})
        MERGE (from)-[r:CALLS]->(to)
        SET r.offset = $o, r.call_type = $c
        """,
        params={"f": "a", "t": "b", "o": "0x10", "c": "Direct"},
    )
    r = cypher_write(
        wh,
        "MATCH (a:Function {uid: $f})-[r:CALLS]->(b:Function {uid: $t}) DELETE r",
        params={"f": "a", "t": "b"},
    )
    assert r == {"table": "calls", "rows": 1}
    assert wh.read("calls").count() == 0
    assert wh.read("functions").count() == 2  # nodes untouched


def test_verbatim_replay_equals_direct_etl(spark, tmp_path):
    """The headline parity: replaying importer.rs's templates over the
    micro-graph fixture == build_graph_tables, table by table."""
    from binaryx_graph_spark.fixtures.micro_graph import write_fixture

    d = write_fixture(tmp_path / "docs")
    docs = read_analysis_json(spark, d)
    expected = build_graph_tables(docs)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.initialize()
    replay_reference_import(wh, docs)

    for table in (
        "binaries", "functions", "strings", "libraries", "contains",
        "imports", "imports_library", "belongs_to", "calls", "contains_string",
    ):
        exp = sorted(tuple(r) for r in expected[table].collect())
        got = sorted(
            tuple(r) for r in wh.read(table).select(*expected[table].columns).collect()
        )
        assert got == exp, f"replay diverged from ETL on {table}"


def test_unwind_bulk_merge(spark, wh):
    """The idiomatic Neo4j bulk-import form: UNWIND $rows AS r MERGE …
    — one set-oriented merge, sequential LWW by list order."""
    r = cypher_write(
        wh,
        """
        UNWIND $rows AS r
        MERGE (f:Function {uid: r.uid})
        SET f.name = r.name, f.address = r.addr, f.type = $ty, f.size = r.size
        """,
        params={
            "ty": "Internal",
            "rows": [
                {"uid": "a", "name": "first", "addr": "0x1", "size": 1},
                {"uid": "b", "name": "bee", "addr": "0x2", "size": 2},
                {"uid": "a", "name": "last", "addr": "0x1b", "size": 3},
            ],
        },
    )
    assert r == {"table": "functions", "rows": 2}
    got = {x["uid"]: (x["name"], x["size"]) for x in wh.read("functions").collect()}
    assert got == {"a": ("last", 3), "b": ("bee", 2)}

    # UNWIND edge form with MATCH endpoints
    r = cypher_write(
        wh,
        """
        UNWIND $rows AS r
        MATCH (from:Function {uid: r.src}), (to:Function {uid: r.dst})
        MERGE (from)-[c:CALLS]->(to)
        SET c.offset = r.off, c.call_type = r.ct
        """,
        params={
            "rows": [
                {"src": "a", "dst": "b", "off": "0x10", "ct": "Direct"},
                {"src": "a", "dst": "ghost", "off": "0x20", "ct": "Direct"},
            ]
        },
    )
    assert r == {"table": "calls", "rows": 1}  # missing endpoint dropped
    assert [tuple(x) for x in wh.read("calls").collect()] == [
        ("a", "b", "0x10", "Direct")
    ]
    # empty list is a clean no-op
    assert cypher_write(
        wh, "UNWIND $rows AS r MERGE (l:Library {name: r.n})", params={"rows": []}
    ) == {"table": None, "rows": 0}
