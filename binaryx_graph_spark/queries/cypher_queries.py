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
from ..fixtures.micro_graph import HASH_A, HASH_B, UID_CREATEFILE, UID_HELPER_A
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
    :CALLS*1..2 from main → DISTINCT reachable callees.  The RETURN
    DISTINCT makes the clause multiplicity-blind, so the compiler
    provably may (and does) use the cheap distinct-pairs BFS instead of
    per-path enumeration — this row gates that fast path."""
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
    # Cypher multiplicity: count(*) over a var-length pattern counts
    # relationship-unique PATHS — one-hop paths are the edges, two-hop
    # paths are ordered edge pairs sharing the middle node with the two
    # relationships distinct (a self-loop cannot pair with itself)
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT CAST(src AS VARCHAR) AS src, CAST(dst AS VARCHAR) AS dst
      FROM (SELECT DISTINCT o_orderkey % 500 AS src, (o_custkey * 13) % 500 AS dst
            FROM orders WHERE o_orderkey % 5 = 0)
    ),
    d1 AS (SELECT count(*) AS n FROM e),
    d2 AS (SELECT count(*) AS n
           FROM e a JOIN e b ON a.dst = b.src
           WHERE NOT (a.src = b.src AND a.dst = b.dst))
    SELECT CAST(d1.n + d2.n AS BIGINT) AS n_paths FROM d1, d2
    """,
    tags=("cypher", "graph", "iterative"),
)
def cypher_varlen_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The compiler at DATA scale (not just the micro-graph fixture):
    variable-length :CALLS*1..2 over the derived call graph (~30k edges
    at sf0.1) with Cypher's one-row-per-path count(*) multiplicity —
    the oracle unrolls both hop depths relationally with the
    no-repeated-relationship rule.  (The DISTINCT-pairs fast path is
    gated separately by cypher_callees_varlen / cypher_degree_topk.)"""
    from ..plans.graph_project import as_call_tables, derived_edges

    calls, nodes = as_call_tables(derived_edges(spark, sf_dir))
    t = {"functions": nodes, "calls": calls}
    return cypher(
        t,
        "MATCH (a:Function)-[:CALLS*1..2]->(b:Function) RETURN count(*) AS n_paths",
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


@register(
    "cypher_paths_verbatim",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'main→helper',                      '0x401000→0x401100',                   '0x401010'),
      (1, 'main→CreateFileA',                 '0x401000→',                           '0x401020'),
      (2, 'main→helper→worker',               '0x401000→0x401100→0x401200',          '0x401010→0x401110'),
      (3, 'main→helper→worker→helper',        '0x401000→0x401100→0x401200→0x401100', '0x401010→0x401110→0x401210'),
      (3, 'main→helper→worker→worker',        '0x401000→0x401100→0x401200→0x401200', '0x401010→0x401110→0x401220')
    ) AS t(path_length, node_names, node_addresses, call_offsets)
    ORDER BY path_length, node_names
    """,
    tags=("cypher", "graph", "paths"),
)
def cypher_paths_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's FLAGSHIP path query, VERBATIM TEXT
    (call_path_analyzer.rs:30-38, depth placeholder = 3): path variable,
    varlen :CALLS*1..3, binary scoping via
    ``ALL(n IN nodes(path) WHERE EXISTS((b)-[:CONTAINS|IMPORTS]->(n)))``
    (lowered to scope-constrained frontier enumeration — out-of-scope
    paths pruned at the level they escape), nodes()/relationships() list
    comprehensions, length(path).  The gate projects the array columns
    to joined strings (the driver hasher takes scalars) and pins all
    five main-rooted paths with their offsets."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(start:Function)
                 MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)
                 WHERE (start.name = $function_name OR start.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND ALL(n IN nodes(path) WHERE EXISTS((b)-[:CONTAINS|IMPORTS]->(n)))
                 RETURN path, length(path) as path_length,
                        [node in nodes(path) | node.name] as node_names,
                        [node in nodes(path) | node.address] as node_addresses,
                        [rel in relationships(path) | rel.offset] as call_offsets""",
        params={"function_name": "main", "binary_name": "mal_a"},
    )
    return out.select(
        F.col("path_length").cast("int").alias("path_length"),
        F.array_join("node_names", "→").alias("node_names"),
        F.array_join("node_addresses", "→").alias("node_addresses"),
        F.array_join("call_offsets", "→").alias("call_offsets"),
    ).orderBy("path_length", "node_names")


@register(
    "cypher_optional_unanchored",
    oracle="""
    SELECT * FROM (VALUES
      ('kernel32', 'mal_a.exe', 'Pay Bitcoin'),
      ('kernel32', 'mal_b.elf', 'Pay Bitcoin')
    ) AS t(lib, filename, val)
    ORDER BY lib, filename
    """,
    tags=("cypher", "join"),
    expects_cartesian=(
        "unanchored OPTIONAL MATCH is Cypher's optional cartesian — the "
        "arm shares no variable with the outer horizon, so a nested-loop "
        "left join on TRUE is the semantics itself (Neo4j executes the "
        "same Apply-on-all-rows shape); bounded only by the arm's data"
    ),
)
def cypher_optional_unanchored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNANCHORED OPTIONAL MATCH (shares no variable with the outer
    horizon) + clause-scoped WHERE: Cypher's optional cartesian — every
    outer row pairs with every match of the standalone arm, and the
    WHERE filters the arm BEFORE the left join.  One library row fans
    out to the two Bitcoin-string containments."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (l:Library)
        OPTIONAL MATCH (b:Binary)-[:CONTAINS_STRING]->(s:String)
        WHERE s.value CONTAINS 'Bitcoin'
        RETURN l.name AS lib, b.filename AS filename, s.value AS val
        ORDER BY lib, filename
        """,
    )


@register(
    "cypher_optional_where_scoped",
    # clause-scoped WHERE semantics: functions NOT in kernel32 keep a
    # NULL lib (the predicate filters the optional arm pre-join); the
    # old post-join filtering would have dropped those five rows
    oracle="""
    SELECT * FROM (VALUES
      ('CreateFileA', 'kernel32'),
      ('exported_fn', CAST(NULL AS VARCHAR)),
      ('helper',      CAST(NULL AS VARCHAR)),
      ('main',        CAST(NULL AS VARCHAR)),
      ('main',        CAST(NULL AS VARCHAR)),
      ('worker',      CAST(NULL AS VARCHAR))
    ) AS t(fn, lib)
    ORDER BY fn
    """,
    tags=("cypher", "join"),
)
def cypher_optional_where_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE inside an OPTIONAL MATCH is scoped to the clause (Cypher
    semantics): unmatched-or-filtered rows survive with NULLs instead
    of being dropped by a post-join filter."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (f:Function)
        OPTIONAL MATCH (f)-[:BELONGS_TO]->(l:Library)
        WHERE l.name = 'kernel32'
        RETURN f.name AS fn, l.name AS lib ORDER BY fn
        """,
    )


@register(
    "cypher_paths_per_path",
    # the oracle IS mg_paths_from_main's pinned result set
    # (call_path_analyzer.rs:29-38): a hash match proves the compiler's
    # var-length path enumeration and the native traverse operator
    # (operators/traverse.py enumerate_paths) agree row-for-row
    oracle="""
    SELECT * FROM (VALUES
      ('main→helper',               1),
      ('main→CreateFileA',          1),
      ('main→helper→worker',        2),
      ('main→helper→worker→helper', 3),
      ('main→helper→worker→worker', 3)
    ) AS t(path, path_length) ORDER BY path_length, path
    """,
    tags=("cypher", "graph"),
)
def cypher_paths_per_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-path multiplicity parity: the G3 all-paths surface
    (call_path_analyzer.rs:20-110) as verbatim Cypher — one row per
    relationship-unique path, prefixes included, cycles revisit nodes —
    gated against the native enumerator's already-green result set."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """
        MATCH path = (start:Function)-[:CALLS*1..3]->(end:Function)
        WHERE start.name = 'main'
        RETURN [node in nodes(path) | node.name] AS names,
               length(path) AS path_length
        """,
    )
    return out.select(
        F.array_join("names", "→").alias("path"),
        F.col("path_length").cast("int").alias("path_length"),
    ).orderBy("path_length", "path")


@register(
    "cypher_varlen_multiplicity",
    # Cypher count(*) over a var-length pattern without a path variable
    # counts PATHS, not endpoint pairs: 10 on the micro-graph.
    # Depth 1: the 5 call edges.  Depth 2: main→helper→worker,
    # helper→worker→helper, helper→worker→worker, worker→helper→worker,
    # worker→worker→helper — and NOT worker→worker→worker, which would
    # repeat the self-loop relationship.  (Distinct endpoint pairs would
    # give 7 — the old pre-parity semantics — so this row fails if the
    # per-path plan ever regresses to pairs.)
    oracle="""
    SELECT CAST(10 AS BIGINT) AS n_paths
    """,
    tags=("cypher", "graph"),
)
def cypher_varlen_multiplicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-multiplicity gate for var-length WITHOUT a path variable:
    ``MATCH (a)-[:CALLS*1..2]->(b) RETURN count(*)`` must count
    relationship-unique paths (Cypher semantics), not distinct endpoint
    pairs — the exact count on the micro-graph is pinned by hand."""
    t = graph_tables(spark)
    return cypher(
        t,
        "MATCH (a:Function)-[:CALLS*1..2]->(b:Function) RETURN count(*) AS n_paths",
    )


@register(
    "cypher_cycles_verbatim",
    oracle="""
    SELECT * FROM (VALUES
      (2, 'worker', '0x401200', 'worker→helper→worker'),
      (3, 'worker', '0x401200', 'worker→helper→worker→worker'),
      (3, 'worker', '0x401200', 'worker→worker→helper→worker')
    ) AS t(depth, function_name, address, path_nodes)
    ORDER BY depth, path_nodes
    """,
    tags=("cypher", "graph", "paths"),
)
def cypher_cycles_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indirect recursion VERBATIM (call_path_analyzer.rs:293-300):
    cycle-shaped path pattern ``path = (f)-[:CALLS*2..10]->(f)`` — the
    same variable at both ends — scoped by the ALL/EXISTS clause; every
    distinct edge-sequence cycle through worker is enumerated (no
    repeated relationships, Cypher's rule)."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)
                 MATCH path = (f:Function)-[:CALLS*2..10]->(f)
                 WHERE (f.name = $function_name OR f.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND ALL(n IN nodes(path) WHERE EXISTS((b)-[:CONTAINS|IMPORTS]->(n)))
                 RETURN length(path) as depth, f.name as function_name, f.address as address,
                        [node in nodes(path) | node.name] as path_nodes""",
        params={"function_name": "worker", "binary_name": "mal_a"},
    )
    return out.select(
        F.col("depth").cast("int").alias("depth"),
        "function_name",
        "address",
        F.array_join("path_nodes", "→").alias("path_nodes"),
    ).orderBy("depth", "path_nodes")


@register(
    "cypher_fulltext_call_verbatim",
    oracle="""
    SELECT * FROM (VALUES
      ('Pay Bitcoin', CAST(1.0 AS DOUBLE), CAST(1 AS BIGINT))
    ) AS t(value, score, sample_count)
    """,
    tags=("cypher", "search"),
)
def cypher_fulltext_call_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fulltext procedure call VERBATIM (importer.rs:385-391):
    ``CALL db.index.fulltext.queryNodes(...) YIELD node, score`` lowered
    to the engine's scored token search, string-ownership MATCH, implicit
    grouping with count(DISTINCT b), ORDER BY score DESC, LIMIT $limit."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """
            CALL db.index.fulltext.queryNodes('string_value_fulltext', $query) YIELD node, score
            MATCH (b:Binary)-[:CONTAINS_STRING]->(node)
            WHERE (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
            RETURN node AS s, score AS score, count(DISTINCT b) AS sample_count
            ORDER BY score DESC
            LIMIT $limit
        """,
        params={"query": "Bitcoin", "binary_name": "mal_a", "limit": 10},
    )
    return out.select(F.col("s_value").alias("value"), "score", "sample_count")


@register(
    "cypher_xref_union_verbatim",
    oracle="""
    SELECT * FROM (VALUES
      ('helper', 'worker', '0x401110'),
      ('main',   'helper', '0x401010'),
      ('worker', 'helper', '0x401210')
    ) AS t(from_function, to_function, "offset")
    ORDER BY "offset"
    """,
    tags=("cypher", "graph"),
)
def cypher_xref_union_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The xref query VERBATIM (importer.rs:553-570): a CALL { ... UNION
    ... } subquery whose branches interleave MATCH/WHERE clauses, unioned
    with Cypher's distinct semantics, then DISTINCT-projected — all
    addresses touching helper's entry point."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """
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
        """,
        params={"binary_name": "mal_a", "address": "0x401100"},
    )
    return out.orderBy("offset")


@register(
    "cypher_exists_callees_verbatim",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_CREATEFILE}', 'CreateFileA'),
      ('{HASH_A}:0x401100', 'helper'),
      ('{HASH_A}:0x401200', 'worker')
    ) AS t(callee_uid, callee_name)
    ORDER BY callee_name
    """,
    tags=("cypher", "graph"),
)
def cypher_exists_callees_verbatim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped callees VERBATIM (importer.rs:479-483): varlen reach with
    the ``EXISTS((b)-[:CONTAINS|IMPORTS]->(callee))`` membership
    predicate — compiled to a distinct-pair left-join marker, no
    correlated subquery."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """MATCH (b:Binary)-[:CONTAINS|IMPORTS]->(f:Function)-[:CALLS*1..3]->(callee:Function)
                 WHERE (f.name = $function_name OR f.uid = $function_name)
                   AND (b.filename CONTAINS $binary_name OR b.hash = $binary_name)
                   AND EXISTS((b)-[:CONTAINS|IMPORTS]->(callee))
                 RETURN DISTINCT callee""",
        params={"function_name": "main", "binary_name": "mal_a"},
    )
    return out.select(
        F.col("callee_uid"), F.col("callee_name")
    ).orderBy("callee_name")


@register(
    "cypher_paths_scaled",
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT CAST(o_orderkey % 500 AS BIGINT) AS src,
             CAST((o_custkey * 13) % 500 AS BIGINT) AS dst
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    p1 AS (SELECT src AS s0, dst AS s1 FROM e WHERE src = 45),
    p2 AS (SELECT p1.s0, p1.s1, e.dst AS s2 FROM p1 JOIN e ON e.src = p1.s1
           WHERE NOT (e.src = p1.s0 AND e.dst = p1.s1)),
    p3 AS (SELECT p2.s0, p2.s1, p2.s2, e.dst AS s3 FROM p2 JOIN e ON e.src = p2.s2
           WHERE NOT (e.src = p2.s0 AND e.dst = p2.s1)
             AND NOT (e.src = p2.s1 AND e.dst = p2.s2))
    SELECT path_length, n_paths FROM (
      SELECT 1 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p1
      UNION ALL SELECT 2 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p2
      UNION ALL SELECT 3 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p3
    ) t
    WHERE n_paths > 0
    ORDER BY path_length
    """,
    tags=("cypher", "graph", "paths", "iterative"),
)
def cypher_paths_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compiled PER-PATH enumeration at DATA scale: the path-variable
    surface (call_path_analyzer.rs:43-49 shape) over the derived dense
    call graph (edge count scales with orders).  The seed WHERE conjunct
    is pushed below the driver-side frontier loop by the compiler (the
    pushdown Catalyst cannot do through iteration), so enumeration
    starts from ONE seed (45 — derived sources are multiples of 5), not
    all 500 — the same plan a hand-written
    traverse would get.  The oracle unrolls three no-repeated-edge hops
    relationally; per-depth path counts must agree exactly."""
    from ..plans.graph_project import as_call_tables, derived_edges

    calls, nodes = as_call_tables(derived_edges(spark, sf_dir))
    t = {"functions": nodes, "calls": calls}
    out = cypher(
        t,
        """MATCH path = (a:Function)-[:CALLS*1..3]->(b:Function)
           WHERE a.name = $seed
           RETURN length(path) as path_length, count(*) as n_paths
           ORDER BY path_length""",
        params={"seed": "45"},
    )
    return out.select(F.col("path_length").cast("int").alias("path_length"), "n_paths")


@register(
    "cypher_with_pipeline",
    oracle="""
    SELECT * FROM (VALUES
      ('mal_a.exe', CAST(3 AS BIGINT), CAST(3 AS BIGINT))
    ) AS t(bin, n_fn, n_strings)
    """,
    tags=("cypher", "agg"),
)
def cypher_with_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WITH pipeline operator (Cypher's horizon): aggregate per
    binary, HAVING-style WHERE on the alias, then a follow-up MATCH
    joining on the carried node variable — compiled as
    groupBy → filter → join, one Catalyst plan end to end."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (b:Binary)-[:CONTAINS]->(f:Function)
        WITH b, count(f) AS n_fn
        WHERE n_fn >= 3
        MATCH (b)-[:CONTAINS_STRING]->(s:String)
        RETURN b.filename AS bin, n_fn, count(s) AS n_strings
        ORDER BY bin
        """,
    )


@register(
    "cypher_topk_pipeline",
    oracle="""
    SELECT * FROM (VALUES
      ('worker', CAST(2 AS BIGINT), CAST(2 AS BIGINT), CAST(-1 AS BIGINT))
    ) AS t(fn, out_deg, n_callers, min_size)
    """,
    tags=("cypher", "agg"),
)
def cypher_topk_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH ORDER BY/LIMIT + the sum/min/max aggregate family: top-2
    functions by out-degree carried through the horizon, expanded to
    their callers, min-aggregated — the top-k-then-expand pipeline real
    graph workloads run, compiled to window-free sort-limit + joins."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (f:Function)-[:CALLS]->(g:Function)
        WITH f, count(g) AS out_deg ORDER BY out_deg DESC, f.name LIMIT 2
        MATCH (f)<-[:CALLS]-(caller:Function)
        RETURN f.name AS fn, out_deg, count(caller) AS n_callers,
               min(caller.size) AS min_size
        ORDER BY fn
        """,
    )


@register(
    "cypher_unwind_batch",
    oracle="""
    SELECT * FROM (VALUES
      ('CreateFileA', CAST(0 AS BIGINT)),
      ('main',        CAST(2 AS BIGINT)),
      ('worker',      CAST(2 AS BIGINT))
    ) AS t(nm, n_callees)
    ORDER BY nm
    """,
    tags=("cypher", "batch"),
)
def cypher_unwind_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNWIND batch lookup with OPTIONAL expansion: a parameter list of
    function names, each resolved and counted (zero-callee names kept
    by the left join) — the batch-API shape clients wrap around
    single-entity queries; compiles to one broadcast hash join."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        UNWIND $names AS nm
        MATCH (f:Function)
        WHERE f.name = nm
        OPTIONAL MATCH (f)-[:CALLS]->(g:Function)
        RETURN nm, count(g) AS n_callees ORDER BY nm
        """,
        params={"names": ["main", "worker", "CreateFileA"]},
    )


@register(
    "cypher_shortest_paths",
    oracle="""
    SELECT * FROM (VALUES
      ('main→CreateFileA',    CAST(1 AS BIGINT)),
      ('main→helper',         CAST(1 AS BIGINT)),
      ('main→helper→worker',  CAST(2 AS BIGINT))
    ) AS t(path_names, len)
    ORDER BY len, path_names
    """,
    tags=("cypher", "graph", "paths"),
)
def cypher_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shortestPath() compiled: min-depth BFS with visited pruning, ONE
    deterministic path per endpoint pair (ties → lexicographically
    smallest uid sequence; Neo4j returns an arbitrary shortest path —
    a stable pick is the reproducible superset of that contract)."""
    t = graph_tables(spark)
    out = cypher(
        t,
        """
        MATCH p = shortestPath((a:Function)-[:CALLS*1..6]->(b:Function))
        WHERE a.name = $fn
        RETURN [n in nodes(p) | n.name] as names, length(p) as len
        ORDER BY len, names
        """,
        params={"fn": "main"},
    )
    return out.select(
        F.array_join("names", "→").alias("path_names"), F.col("len").cast("long").alias("len")
    ).orderBy("len", "path_names")


@register(
    "cypher_degree_topk_scaled",
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT DISTINCT CAST(o_orderkey % 500 AS BIGINT) AS src,
             CAST((o_custkey * 13) % 500 AS BIGINT) AS dst
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT CAST(src AS VARCHAR) AS node, CAST(count(*) AS BIGINT) AS out_deg
    FROM e
    GROUP BY src
    ORDER BY out_deg DESC, CAST(src AS VARCHAR)
    LIMIT 10
    """,
    tags=("cypher", "agg", "iterative"),
)
def cypher_degree_topk_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WITH top-k pipeline at DATA scale: out-degree ranking over
    the dense derived call graph (~22k edges at sf0.1) through the
    compiler — implicit grouping, ORDER BY the aggregate alias, LIMIT
    with a name tie-break; Catalyst plans the sort-limit as
    TakeOrderedAndProject, the same plan a hand-written top-k gets."""
    from ..plans.graph_project import as_call_tables, derived_edges

    calls, nodes = as_call_tables(derived_edges(spark, sf_dir))
    t = {"functions": nodes, "calls": calls}
    return cypher(
        t,
        """
        MATCH (a:Function)-[:CALLS]->(b:Function)
        WITH a, count(b) AS out_deg ORDER BY out_deg DESC, a.name LIMIT 10
        RETURN a.name AS node, out_deg ORDER BY out_deg DESC, node
        """,
    )


@register(
    "cypher_agg_stats",
    oracle="""
    SELECT * FROM (VALUES
      ('mal_a.exe', CAST(3 AS BIGINT), CAST(126 AS BIGINT),
       CAST(-1 AS BIGINT), CAST(128 AS BIGINT), CAST(42.0 AS DOUBLE)),
      ('mal_b.elf', CAST(1 AS BIGINT), CAST(64 AS BIGINT),
       CAST(64 AS BIGINT), CAST(64 AS BIGINT), CAST(64.0 AS DOUBLE))
    ) AS t(file, n, total_size, smallest, biggest, mean_size)
    ORDER BY file
    """,
    tags=("cypher", "agg"),
)
def cypher_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full RETURN aggregate surface in one implicit-grouping clause:
    sum/min/max/avg over a node property plus count(*), grouped by the
    non-aggregate item (b.filename) — the reference's stats shapes
    (importer.rs:73, client.rs:98) generalized beyond count.  The -1s
    are engine semantics, not accident: mal_a's `main` is re-MERGEd by
    its export entry (no size → -1 sentinel, session.rs:226), and
    `worker` never had one — sum/min see the sentinels exactly as the
    reference's LWW store does."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (b:Binary)-[:CONTAINS]->(f:Function)
        WITH b.filename AS file, count(*) AS n, sum(f.size) AS total_size,
             min(f.size) AS smallest, max(f.size) AS biggest, avg(f.size) AS mean_size
        RETURN file, n, total_size, smallest, biggest, mean_size
        ORDER BY file
        """,
    )


@register(
    "cypher_agg_pipeline",
    oracle="""
    SELECT CAST(3 AS BIGINT) AS total_calls, CAST(2 AS BIGINT) AS n_callers,
           CAST(1.5 AS DOUBLE) AS mean_calls, CAST(-1 AS BIGINT) AS min_callee_size,
           'worker' AS last_caller
    """,
    tags=("cypher", "agg"),
)
def cypher_agg_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aggregation PIPELINE end-to-end: implicit grouping in WITH
    (count + min over a joined node property), ORDER BY the aggregate
    alias with a deterministic name tie-break, SKIP 1 LIMIT 2
    pagination, then a SECOND aggregation stage over the surviving
    aliases (sum/avg/min/max over WITH-created scalars).  Pins the
    clause-ordering semantics reference users hit with
    `WITH ... ORDER BY ... SKIP` combos: pagination applies to the
    grouped rows BEFORE the re-aggregation sees them — dropping `main`
    (rank 1) leaves worker+helper, hence total 3 of 5 calls."""
    t = graph_tables(spark)
    return cypher(
        t,
        """
        MATCH (caller:Function)-[:CALLS]->(callee:Function)
        WITH caller.name AS caller, count(*) AS n_calls,
             min(callee.size) AS smallest_callee
        ORDER BY n_calls DESC, caller ASC
        SKIP 1 LIMIT 2
        RETURN sum(n_calls) AS total_calls, count(*) AS n_callers,
               avg(n_calls) AS mean_calls, min(smallest_callee) AS min_callee_size,
               max(caller) AS last_caller
        """,
    )


@register(
    "cypher_varlen_rel_pred",
    # Pre-filtering the edge list to the predicate-satisfying subset is
    # EXACTLY ALL(r IN relationships(p) WHERE …) semantics: every path
    # relationship must pass, so a path exists in the filtered graph iff
    # it satisfies the ALL.  The oracle unrolls three no-repeated-edge
    # hops over the Direct-only edge subset (cypher_paths_scaled shape).
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT DISTINCT CAST(o_orderkey % 500 AS BIGINT) AS src,
               CAST((o_custkey * 13) % 500 AS BIGINT) AS dst
        FROM orders WHERE o_orderkey % 5 = 0) t
      WHERE (src * 7 + dst) % 3 <> 0
    ),
    p1 AS (SELECT src AS s0, dst AS s1 FROM e WHERE src = 45),
    p2 AS (SELECT p1.s0, p1.s1, e.dst AS s2 FROM p1 JOIN e ON e.src = p1.s1
           WHERE NOT (e.src = p1.s0 AND e.dst = p1.s1)),
    p3 AS (SELECT p2.s0, p2.s1, p2.s2, e.dst AS s3 FROM p2 JOIN e ON e.src = p2.s2
           WHERE NOT (e.src = p2.s0 AND e.dst = p2.s1)
             AND NOT (e.src = p2.s1 AND e.dst = p2.s2))
    SELECT path_length, n_paths FROM (
      SELECT 1 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p1
      UNION ALL SELECT 2 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p2
      UNION ALL SELECT 3 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p3
    ) t
    WHERE n_paths > 0
    ORDER BY path_length
    """,
    tags=("cypher", "graph", "paths", "iterative"),
)
def cypher_varlen_rel_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationship-property predicates in var-length patterns — the
    reference's per-binary path variant shape (call_path_analyzer.rs:34:
    ``ALL(r IN relationships(path) WHERE r.call_type = 'Direct')``) at
    DATA scale.  The compiler lowers the ALL into an edge-frame filter
    BEFORE the frontier loop, so non-Direct edges never enter any level
    join — the predicate pushdown Catalyst cannot do through driver-side
    iteration.  The derived graph assigns call_type deterministically
    per edge ((src·7+dst) mod 3 → ~1/3 Indirect), so the predicate
    genuinely prunes; the oracle unrolls three hops over the Direct-only
    subset."""
    from ..plans.graph_project import as_call_tables, derived_edges

    edges = derived_edges(spark, sf_dir)
    _, nodes = as_call_tables(edges)
    calls = edges.select(
        F.col("src").cast("string").alias("src_uid"),
        F.col("dst").cast("string").alias("dst_uid"),
        F.lit("").alias("offset"),
        F.when((F.col("src") * 7 + F.col("dst")) % 3 == 0, "Indirect")
        .otherwise("Direct")
        .alias("call_type"),
    )
    t = {"functions": nodes, "calls": calls}
    out = cypher(
        t,
        """MATCH path = (a:Function)-[:CALLS*1..3]->(b:Function)
           WHERE a.name = $seed
             AND ALL(r IN relationships(path) WHERE r.call_type = 'Direct')
           RETURN length(path) as path_length, count(*) as n_paths
           ORDER BY path_length""",
        params={"seed": "45"},
    )
    return out.select(F.col("path_length").cast("int").alias("path_length"), "n_paths")


@register(
    "cypher_varlen_rel_pred_in",
    # Same ALL-lowering identity as cypher_varlen_rel_pred, for the r8
    # operator surface: IN-list membership (here bound via $param) over
    # a 4-way call_type assignment — the oracle unrolls three
    # no-repeated-edge hops over the {Direct, Tail} edge subset.
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT DISTINCT CAST(o_orderkey % 500 AS BIGINT) AS src,
               CAST((o_custkey * 13) % 500 AS BIGINT) AS dst
        FROM orders WHERE o_orderkey % 5 = 0) t
      WHERE (src * 7 + dst) % 4 IN (0, 3)
    ),
    p1 AS (SELECT src AS s0, dst AS s1 FROM e WHERE src = 45),
    p2 AS (SELECT p1.s0, p1.s1, e.dst AS s2 FROM p1 JOIN e ON e.src = p1.s1
           WHERE NOT (e.src = p1.s0 AND e.dst = p1.s1)),
    p3 AS (SELECT p2.s0, p2.s1, p2.s2, e.dst AS s3 FROM p2 JOIN e ON e.src = p2.s2
           WHERE NOT (e.src = p2.s0 AND e.dst = p2.s1)
             AND NOT (e.src = p2.s1 AND e.dst = p2.s2))
    SELECT path_length, n_paths FROM (
      SELECT 1 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p1
      UNION ALL SELECT 2 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p2
      UNION ALL SELECT 3 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p3
    ) t
    WHERE n_paths > 0
    ORDER BY path_length
    """,
    tags=("cypher", "graph", "paths", "iterative"),
)
def cypher_varlen_rel_pred_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list relationship predicates in var-length patterns (r7
    verdict #5: extend the ALL(...) body beyond '=' literals — the
    native traversal's edge filter takes arbitrary Column predicates,
    so the Cypher surface now admits <>, IN [..]/IN $param, and $param
    comparisons with the same reject-loudly boundary).  The derived
    graph assigns one of four call types per edge ((src·7+dst) mod 4);
    ``r.call_type IN $types`` with a two-type parameter list keeps half
    the edges, and the ALL lowers to an isin() edge-frame filter before
    the frontier loop — same pushdown-through-iteration story as the
    '=' gate row."""
    from ..plans.graph_project import as_call_tables, derived_edges

    edges = derived_edges(spark, sf_dir)
    _, nodes = as_call_tables(edges)
    types = ["Direct", "Indirect", "Virtual", "Tail"]
    calls = edges.select(
        F.col("src").cast("string").alias("src_uid"),
        F.col("dst").cast("string").alias("dst_uid"),
        F.lit("").alias("offset"),
        F.element_at(
            F.array(*[F.lit(t) for t in types]),
            ((F.col("src") * 7 + F.col("dst")) % 4 + 1).cast("int"),
        ).alias("call_type"),
    )
    t = {"functions": nodes, "calls": calls}
    out = cypher(
        t,
        """MATCH path = (a:Function)-[:CALLS*1..3]->(b:Function)
           WHERE a.name = $seed
             AND ALL(r IN relationships(path) WHERE r.call_type IN $types)
           RETURN length(path) as path_length, count(*) as n_paths
           ORDER BY path_length""",
        params={"seed": "45", "types": ["Direct", "Tail"]},
    )
    return out.select(F.col("path_length").cast("int").alias("path_length"), "n_paths")


@register(
    "cypher_varlen_rel_pred_not_in",
    # Same ALL-lowering identity, for the NEGATED membership surface:
    # NOT (x IN $list) composed with <>-against-$param — the oracle
    # unrolls three no-repeated-edge hops over the {Direct, Virtual}
    # edge subset ((src*7+dst) mod 4 IN (0, 2)).
    oracle="""
    WITH e AS MATERIALIZED (
      SELECT src, dst FROM (
        SELECT DISTINCT CAST(o_orderkey % 500 AS BIGINT) AS src,
               CAST((o_custkey * 13) % 500 AS BIGINT) AS dst
        FROM orders WHERE o_orderkey % 5 = 0) t
      WHERE (src * 7 + dst) % 4 IN (0, 2)
    ),
    p1 AS (SELECT src AS s0, dst AS s1 FROM e WHERE src = 45),
    p2 AS (SELECT p1.s0, p1.s1, e.dst AS s2 FROM p1 JOIN e ON e.src = p1.s1
           WHERE NOT (e.src = p1.s0 AND e.dst = p1.s1)),
    p3 AS (SELECT p2.s0, p2.s1, p2.s2, e.dst AS s3 FROM p2 JOIN e ON e.src = p2.s2
           WHERE NOT (e.src = p2.s0 AND e.dst = p2.s1)
             AND NOT (e.src = p2.s1 AND e.dst = p2.s2))
    SELECT path_length, n_paths FROM (
      SELECT 1 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p1
      UNION ALL SELECT 2 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p2
      UNION ALL SELECT 3 AS path_length, CAST(count(*) AS BIGINT) AS n_paths FROM p3
    ) t
    WHERE n_paths > 0
    ORDER BY path_length
    """,
    tags=("cypher", "graph", "paths", "iterative"),
)
def cypher_varlen_rel_pred_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEGATED membership + param inequality in var-length relationship
    predicates (r8 verdict #6: NOT (x IN [...]) and <>-against-$param
    compile through the same reject-loudly ALL boundary).  The derived
    graph assigns one of four call types per edge ((src·7+dst) mod 4);
    ``NOT r.call_type IN $types AND r.call_type <> $excl`` with
    $types=['Tail'], $excl='Indirect' keeps {Direct, Virtual} — the ALL
    lowers to ``~isin(...) & (col != lit)`` on the edge frame BEFORE the
    frontier loop, the same pushdown-through-iteration as the IN gate
    row; differential fuzz for these forms lives in
    tests/test_cypher_rel_pred.py."""
    from ..plans.graph_project import as_call_tables, derived_edges

    edges = derived_edges(spark, sf_dir)
    _, nodes = as_call_tables(edges)
    types = ["Direct", "Indirect", "Virtual", "Tail"]
    calls = edges.select(
        F.col("src").cast("string").alias("src_uid"),
        F.col("dst").cast("string").alias("dst_uid"),
        F.lit("").alias("offset"),
        F.element_at(
            F.array(*[F.lit(t) for t in types]),
            ((F.col("src") * 7 + F.col("dst")) % 4 + 1).cast("int"),
        ).alias("call_type"),
    )
    t = {"functions": nodes, "calls": calls}
    out = cypher(
        t,
        """MATCH path = (a:Function)-[:CALLS*1..3]->(b:Function)
           WHERE a.name = $seed
             AND ALL(r IN relationships(path)
                     WHERE NOT r.call_type IN $types AND r.call_type <> $excl)
           RETURN length(path) as path_length, count(*) as n_paths
           ORDER BY path_length""",
        params={"seed": "45", "types": ["Tail"], "excl": "Indirect"},
    )
    return out.select(F.col("path_length").cast("int").alias("path_length"), "n_paths")
