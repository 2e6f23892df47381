"""Gate queries written IN CYPHER — the reference's actual query texts
(or minimally adapted ones) compiled by binaryx_graph_spark.cypher and
checked against exact VALUES oracles on the micro-graph fixture.

This is the portability proof for reference users: the Cypher they run
today (importer.rs, call_path_analyzer.rs) executes on this engine via
the subset compiler, producing Catalyst plans like any native query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cypher import cypher
from ..fixtures.micro_graph import HASH_A, HASH_B, UID_HELPER_A
from ..registry import register
from .ingest_demo import graph_tables


@register(
    "cypher_scoped_function_search",
    oracle=f"""
    SELECT * FROM (VALUES ('{UID_HELPER_A}', 'helper')) AS t(uid, name)
    """,
    tags=("cypher", "search"),
)
def cypher_scoped_function_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's F1 scoped search, VERBATIM Cypher shape
    (importer.rs:329-333) through the subset compiler: membership scope
    via the CONTAINS|IMPORTS union, name/uid substring predicate,
    binary filter by filename-contains-or-hash-equals, LIMIT 100."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)
        WHERE (f.name CONTAINS $pattern OR f.uid CONTAINS $pattern)
          AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
        RETURN DISTINCT f.uid AS uid, f.name AS name
        ORDER BY uid
        LIMIT 100
        """,
        params={"pattern": "elp", "binary_name": "mal_a"},
    )


@register(
    "cypher_callees_varlen",
    oracle="""
    SELECT * FROM (VALUES ('CreateFileA'), ('helper'), ('worker')) AS t(callee)
    ORDER BY callee
    """,
    tags=("cypher", "graph"),
)
def cypher_callees_varlen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's G1 callees-to-depth query shape
    (call_path_analyzer.rs:122-132) in Cypher: variable-length
    :CALLS*1..2 from main → DISTINCT reachable callees (endpoint-pair
    semantics; per-path rows stay with the traverse operators)."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (f:Function {name: 'main'})-[:CALLS*1..2]->(callee:Function)
        RETURN DISTINCT callee.name AS callee
        ORDER BY callee
        """,
    )


@register(
    "cypher_string_xref",
    oracle=f"""
    SELECT * FROM (VALUES
      ('Pay Bitcoin', '{HASH_A}', 'mal_a.exe'),
      ('Pay Bitcoin', '{HASH_B}', 'mal_b.elf')
    ) AS t(value, hash, filename)
    ORDER BY hash
    """,
    tags=("cypher", "search"),
)
def cypher_string_xref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's T4 string-ownership join (importer.rs:387-397) in
    Cypher: which binaries contain the Bitcoin string — reversed-
    direction pattern, DISTINCT projection over two node variables."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (s:String)<-[:CONTAINS_STRING]-(b:Binary)
        WHERE s.value CONTAINS 'Bitcoin'
        RETURN DISTINCT s.value AS value, b.hash AS hash, b.filename AS filename
        ORDER BY hash
        """,
    )


@register(
    "cypher_global_counts",
    oracle="""
    SELECT CAST(5 AS BIGINT) AS n_calls
    """,
    tags=("cypher", "agg"),
)
def cypher_global_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's A1 stats count (importer.rs:73) verbatim shape:
    MATCH ()-[r:CALLS]->() RETURN count(r) — anonymous endpoints, edge
    aggregate."""
    t = graph_tables(spark)
    return cypher(t, "MATCH ()-[r:CALLS]->() RETURN count(*) AS n_calls")


@register(
    "cypher_call_frequency",
    oracle="""
    SELECT * FROM (VALUES
      ('helper', CAST(1 AS BIGINT)),
      ('main', CAST(2 AS BIGINT)),
      ('worker', CAST(2 AS BIGINT))
    ) AS t(caller, n_calls)
    ORDER BY caller
    """,
    tags=("cypher", "agg"),
)
def cypher_call_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's G8 call-frequency shape (importer.rs caller
    aggregation) in Cypher with IMPLICIT GROUPING — non-aggregate RETURN
    items become the grouping keys, exactly Neo4j's semantics."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (caller:Function)-[:CALLS]->(callee:Function)
        RETURN caller.name AS caller, count(*) AS n_calls
        ORDER BY caller
        """,
    )


@register(
    "cypher_optional_callees",
    oracle="""
    SELECT * FROM (VALUES
      ('CreateFileA', CAST(0 AS BIGINT)),
      ('exported_fn', CAST(0 AS BIGINT)),
      ('helper', CAST(1 AS BIGINT)),
      ('main', CAST(2 AS BIGINT)),
      ('worker', CAST(2 AS BIGINT))
    ) AS t(fn, n_callees)
    ORDER BY fn
    """,
    tags=("cypher", "graph"),
)
def cypher_optional_callees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIONAL MATCH (the reference's export query device,
    client.rs:98): every function keeps a row even with zero callees —
    left-join semantics, count(g) counting only real matches."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (f:Function)
        OPTIONAL MATCH (f)-[:CALLS]->(g:Function)
        RETURN f.name AS fn, count(g) AS n_callees
        ORDER BY fn
        """,
    )


@register(
    "cypher_varlen_scaled",
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst
      FROM (SELECT DISTINCT o_orderkey % 500 AS src, (o_custkey * 13) % 500 AS dst
            FROM orders WHERE o_orderkey % 5 = 0)
    ),
    d1 AS (SELECT src, dst FROM e),
    d2 AS (SELECT a.src, b.dst FROM e a JOIN e b ON a.dst = b.src),
    pairs AS (SELECT DISTINCT src, dst FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2))
    SELECT CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs
    """,
    tags=("cypher", "graph", "iterative"),
)
def cypher_varlen_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compiler at DATA scale (not just the micro-graph fixture):
    variable-length :CALLS*1..2 over the derived call graph (~30k
    edges at sf0.1) — the compiled frontier iteration is the same
    distinct-pairs BFS the native traverse operators use, and the
    oracle unrolls the two hops relationally."""
    from ..plans.graph_project import as_call_tables, derived_edges

    calls, nodes = as_call_tables(derived_edges(spark, sf_dir))
    t = {"functions": nodes, "calls": calls}
    return cypher(
        t,
        "MATCH (a:Function)-[:CALLS*1..2]->(b:Function) RETURN count(*) AS n_pairs",
    )


@register(
    "cypher_export_graph",
    oracle="""
    SELECT rel_type, CAST(n AS BIGINT) AS n FROM (VALUES
      ('CONTAINS', 4), ('CONTAINS_STRING', 4), ('IMPORTS', 2), ('IMPORTS_LIBRARY', 2)
    ) AS t(rel_type, n)
    ORDER BY rel_type
    """,
    tags=("cypher", "export"),
)
def cypher_export_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference export query shape, verbatim device (client.rs:98:
    ``MATCH (n) OPTIONAL MATCH (n)-[r]->(m) RETURN n, type(r), m``) —
    label-less nodes, untyped relationships, OPTIONAL MATCH, type(r).
    The gate pins the Binary-sourced relationship histogram of the
    export (every edge type with its exact multiplicity)."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """
        MATCH (n)
        OPTIONAL MATCH (n)-[r]->(m)
        RETURN n, type(r) AS rel_type, m
        """,
    )
    return (
        out.filter(F.col("n_label") == "Binary")
        .groupBy("rel_type")
        .count()
        .select("rel_type", F.col("count").cast("long").alias("n"))
        .orderBy("rel_type")
    )
