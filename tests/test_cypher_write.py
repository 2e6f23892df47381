"""The reference's WRITE statements, VERBATIM, through cypher_write.

Statement texts are copied from /root/reference/src/neo4j/importer.rs
(86-320) and connection.rs:170; executed against a scratch warehouse and
verified by reading the tables back (plus a read-query round trip through
the same compiler)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.cypher import cypher, cypher_write
from binaryx_graph_spark.sources.warehouse import Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.initialize()
    return w


def test_reference_import_sequence_verbatim(spark, wh):
    # importer.rs:87-94 — binary upsert
    r = cypher_write(
        wh,
        """
            MERGE (b:Binary {hash: $hash})
            SET b.filename = $filename,
                b.file_path = $file_path,
                b.file_size = $file_size,
                b.format = $format,
                b.arch = $arch
        """,
        params={
            "hash": "f" * 64, "filename": "x.exe", "file_path": "/tmp/x.exe",
            "file_size": 1024, "format": "PE", "arch": "x86_64",
        },
    )
    assert r == {"table": "binaries", "rows": 1}

    # importer.rs:115-121 — two functions
    for uid, name, addr in [("u1", "alpha", "0x1000"), ("u2", "beta", "0x2000")]:
        cypher_write(
            wh,
            """
            MERGE (f:Function {uid: $uid})
            SET f.name = $name,
                f.address = $address,
                f.type = $type,
                f.size = $size
        """,
            params={"uid": uid, "name": name, "address": addr, "type": "Internal", "size": 64},
        )

    # importer.rs:235 — library, then 192-194 — string
    cypher_write(wh, "MERGE (l:Library {name: $name})", params={"name": "kernel32"})
    cypher_write(
        wh,
        """
            MERGE (s:String {uid: $uid})
            SET s.value = $value
        """,
        params={"uid": "str:1", "value": "hello"},
    )

    # importer.rs:152-155 — contains edge
    r = cypher_write(
        wh,
        """
            MATCH (b:Binary {hash: $binary_hash}), (f:Function {uid: $function_uid})
            MERGE (b)-[:CONTAINS]->(f)
        """,
        params={"binary_hash": "f" * 64, "function_uid": "u1"},
    )
    assert r == {"table": "contains", "rows": 1}

    # importer.rs:299-303 — calls edge with SET
    cypher_write(
        wh,
        """
            MATCH (from:Function {uid: $from_uid}), (to:Function {uid: $to_uid})
            MERGE (from)-[r:CALLS]->(to)
            SET r.offset = $offset,
                r.call_type = $call_type
        """,
        params={"from_uid": "u1", "to_uid": "u2", "offset": "0x1010", "call_type": "Direct"},
    )

    # importer.rs:215-217 — contains_string with the address in the MERGE key
    cypher_write(
        wh,
        """
            MATCH (b:Binary {hash: $binary_hash}), (s:String {uid: $string_uid})
            MERGE (b)-[r:CONTAINS_STRING {address: $address}]->(s)
        """,
        params={"binary_hash": "f" * 64, "string_uid": "str:1", "address": "0x3000"},
    )

    # read everything back through the READ compiler
    t = {n: wh.read(n) for n in (
        "binaries", "functions", "strings", "libraries",
        "contains", "imports", "imports_library", "belongs_to",
        "calls", "contains_string",
    )}
    assert cypher(t, "MATCH (b:Binary) RETURN count(b) as count").head()["count"] == 1
    got = cypher(
        t,
        "MATCH (from:Function)-[r:CALLS]->(to:Function) "
        "RETURN from.name as a, to.name as b, r.offset as o",
    ).head()
    assert (got["a"], got["b"], got["o"]) == ("alpha", "beta", "0x1010")


def test_merge_is_idempotent_and_set_is_partial(spark, wh):
    q = "MERGE (f:Function {uid: $uid}) SET f.name = $name"
    cypher_write(wh, q, params={"uid": "u9", "name": "first"})
    cypher_write(wh, q, params={"uid": "u9", "name": "second"})
    rows = wh.read("functions").collect()
    assert len(rows) == 1 and rows[0]["name"] == "second"

    # a later SET touching a different property keeps earlier ones
    cypher_write(
        wh,
        "MERGE (f:Function {uid: $uid}) SET f.address = $address",
        params={"uid": "u9", "address": "0x9000"},
    )
    row = wh.read("functions").head()
    assert row["name"] == "second" and row["address"] == "0x9000"


def test_edge_merge_requires_matched_endpoints(spark, wh):
    r = cypher_write(
        wh,
        """
            MATCH (b:Binary {hash: $binary_hash}), (f:Function {uid: $function_uid})
            MERGE (b)-[:CONTAINS]->(f)
        """,
        params={"binary_hash": "0" * 64, "function_uid": "nope"},
    )
    assert r == {"table": "contains", "rows": 0}
    assert wh.read("contains").isEmpty()


def test_detach_delete_clears(spark, wh):
    cypher_write(wh, "MERGE (l:Library {name: $name})", params={"name": "libc"})
    assert not wh.read("libraries").isEmpty()
    r = cypher_write(wh, "MATCH (n) DETACH DELETE n")
    assert r["table"] == "clear"
    assert wh.read("libraries").isEmpty()


def test_write_rejections(spark, wh):
    for bad, params in [
        # MERGE must key on the unique constraint
        ("MERGE (f:Function {name: $n})", {"n": "x"}),
        # SET on a different variable
        ("MERGE (f:Function {uid: $u}) SET g.name = $n", {"u": "u1", "n": "x"}),
        # unknown column
        ("MERGE (f:Function {uid: $u}) SET f.nope = $n", {"u": "u1", "n": "x"}),
        # plain read is not a write
        ("MATCH (f:Function {uid: $u}) RETURN f", {"u": "u1"}),
    ]:
        with pytest.raises(ValueError):
            cypher_write(wh, bad, params=params)


def test_write_parser_fuzz_rejects_cleanly():
    """Near-miss write statements must raise ValueError (never a crash
    or a silent no-op parse) — hypothesis over template mutations."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from binaryx_graph_spark.cypher import CypherWriteParser

    templates = [
        "MERGE (f:{label} {{uid: $u}})",
        "MERGE (f:{label} {{uid: $u}}) SET f.name = $n",
        "MATCH (a:{label} {{uid: $u}}), (b:Function {{uid: $v}}) MERGE (a)-[:{ty}]->(b)",
        "MATCH (n) DETACH DELETE {var}",
        "MERGE (f:Function {{uid: $u}}) SET {var}.name = $n",
    ]

    @settings(max_examples=60, deadline=None)
    @given(
        st.sampled_from(templates),
        st.sampled_from(["Function", "Binary", "Nope", "CALLS", ""]),
        st.sampled_from(["CALLS", "CONTAINS", "NOPE", "BELONGS_TO"]),
        st.sampled_from(["n", "f", "zzz"]),
    )
    def run(tpl, label, ty, var):
        text = tpl.format(label=label, ty=ty, var=var)
        params = {"u": "u1", "v": "u2", "n": "x"}
        try:
            CypherWriteParser(text, params).parse_write()
        except ValueError:
            pass  # loud rejection is the contract

    run()
