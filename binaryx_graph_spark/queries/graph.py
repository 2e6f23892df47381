"""Graph traversal queries (SURVEY.md §2.6-2.7) for the correctness gate.

Two oracle strategies:
- micro-graph fixture → static VALUES oracles (exact reference invariants
  from FIXTURES.md §3)
- derived testdata graph → DuckDB **recursive CTE** oracles, so BFS /
  path enumeration / cycle detection are independently recomputed by the
  oracle engine at every scale factor
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.traverse import (
    call_sequences,
    direct_recursion,
    enumerate_paths,
    indirect_recursion,
    reachable,
)
from ..plans.graph_project import SQL_EDGES, as_call_tables, derived_edges
from ..registry import register
from .ingest_demo import graph_tables
from ..fixtures.micro_graph import (
    HASH_A,
    UID_CREATEFILE,
    UID_HELPER_A,
    UID_MAIN_A,
    UID_WORKER_A,
)


def _members_of(tables, binary_hash: str) -> DataFrame:
    """J2 member set: functions CONTAINed by or IMPORTed into a binary
    (the `[:CONTAINS|IMPORTS]` union, importer.rs:329/479)."""
    c = tables["contains"].filter(F.col("binary_hash") == binary_hash).select(
        F.col("function_uid").alias("uid")
    )
    i = tables["imports"].filter(F.col("binary_hash") == binary_hash).select(
        F.col("function_uid").alias("uid")
    )
    return c.unionByName(i).distinct()


# ---------------------------------------------------------------------------
# Micro-graph: exact reference invariants (VALUES oracles)
# ---------------------------------------------------------------------------


@register(
    "mg_callgraph_callees",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_HELPER_A}',   1),
      ('{UID_CREATEFILE}', 1),
      ('{UID_WORKER_A}',   2)
    ) AS t(uid, depth) ORDER BY depth, uid
    """,
    tags=("graph",),
)
def mg_callgraph_callees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: callees of main(A) to depth 3, scoped to binary A
    (importer.rs:471-511)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_MAIN_A).select("uid")
    return reachable(
        t["calls"], seeds, direction="out", max_depth=3, members=_members_of(t, HASH_A)
    ).orderBy("depth", "uid")


@register(
    "mg_callgraph_callers",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}',   1),
      ('{UID_WORKER_A}', 1),
      ('{UID_HELPER_A}', 2)
    ) AS t(uid, depth) ORDER BY depth, uid
    """,
    tags=("graph",),
)
def mg_callgraph_callers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: callers reaching helper(A) within 2 hops — includes helper
    itself via the helper→worker→helper cycle (importer.rs:513-549)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_HELPER_A).select("uid")
    return reachable(t["calls"], seeds, direction="in", max_depth=2).orderBy("depth", "uid")


@register(
    "mg_paths_from_main",
    oracle="""
    SELECT * FROM (VALUES
      ('main→helper',               1),
      ('main→CreateFileA',          1),
      ('main→helper→worker',        2),
      ('main→helper→worker→helper', 3),
      ('main→helper→worker→worker', 3)
    ) AS t(path, path_length) ORDER BY path_length, path
    """,
    tags=("graph",),
)
def mg_paths_from_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3: ALL paths 1..3 from main(A) — prefixes included, no repeated
    relationship, cycles revisit nodes (call_path_analyzer.rs:20-110)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_MAIN_A).select("uid")
    paths = enumerate_paths(t["calls"], t["functions"], seeds, direction="out", max_depth=3)
    return paths.select(
        F.concat_ws("→", "node_names").alias("path"), "path_length"
    ).orderBy("path_length", "path")


@register(
    "mg_upward_chains",
    oracle="""
    SELECT * FROM (VALUES
      ('main→helper',          1),
      ('worker→helper',        1),
      ('helper→worker→helper', 2),
      ('worker→worker→helper', 2)
    ) AS t(chain, chain_length) ORDER BY chain_length, chain
    """,
    tags=("graph",),
)
def mg_upward_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: upward call chains INTO helper(A), depth ≤2, displayed
    caller-first (call_path_analyzer.rs:334-430)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_HELPER_A).select("uid")
    paths = enumerate_paths(t["calls"], t["functions"], seeds, direction="in", max_depth=2)
    return paths.select(
        F.concat_ws("→", F.reverse("node_names")).alias("chain"),
        F.col("path_length").alias("chain_length"),
    ).orderBy("chain_length", "chain")


@register(
    "mg_direct_recursion",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_WORKER_A}', 'worker', '0x401220', 'Tail')
    ) AS t(uid, name, "offset", call_type)
    """,
    tags=("graph",),
)
def mg_direct_recursion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: direct self-loop recursion (call_path_analyzer.rs:253-290)."""
    t = graph_tables(spark)
    return direct_recursion(t["calls"], t["functions"])


@register(
    "mg_indirect_recursion",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_HELPER_A}', 2),
      ('{UID_WORKER_A}', 2)
    ) AS t(uid, cycle_length) ORDER BY uid
    """,
    tags=("graph",),
)
def mg_indirect_recursion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7: shortest cycle ≥2 per function, bound 10
    (call_path_analyzer.rs:292-331)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("type") == "Internal").select("uid")
    return indirect_recursion(t["calls"], seeds, max_depth=10).orderBy("uid")


@register(
    "mg_call_sequences",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}', '{UID_HELPER_A}',   'helper',      '0x401010', 'Direct',   1),
      ('{UID_MAIN_A}', '{UID_CREATEFILE}', 'CreateFileA', '0x401020', 'Indirect', 2)
    ) AS t(function_uid, peer_uid, peer_name, "offset", call_type, "order")
    ORDER BY "order"
    """,
    tags=("graph",),
)
def mg_call_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: execution-order call sequence of main(A) — lexicographic RAW
    offset sort + order counter (call_path_analyzer.rs:196-251)."""
    t = graph_tables(spark)
    return call_sequences(
        t["calls"], t["functions"], F.col("uid") == UID_MAIN_A, direction="out"
    ).orderBy("order")


# ---------------------------------------------------------------------------
# Derived testdata graph: recursive-CTE oracles (scale with sf)
# ---------------------------------------------------------------------------


@register(
    "graph_reachability",
    oracle=f"""
    WITH RECURSIVE
    edges AS ({SQL_EDGES}),
    walk(uid, depth) AS (
      SELECT CAST(35 AS BIGINT), 0
      UNION
      SELECT e.dst, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.uid
      WHERE w.depth < 4
    )
    SELECT uid, CAST(min(depth) AS INTEGER) AS depth
    FROM walk WHERE depth > 0 GROUP BY uid
    ORDER BY depth, uid
    """,
    tags=("graph", "headline"),
)
def graph_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 at scale: min-hop BFS to depth 4 over the derived graph; the
    oracle recomputes it with a recursive CTE."""
    calls, nodes = as_call_tables(derived_edges(spark, sf_dir))
    seeds = spark.createDataFrame([("35",)], "uid string")
    out = reachable(calls, seeds, direction="out", max_depth=4)
    return out.select(F.col("uid").cast("long").alias("uid"), "depth").orderBy("depth", "uid")


@register(
    "graph_path_enumeration",
    oracle=f"""
    WITH RECURSIVE
    edges AS ({SQL_EDGES}),
    paths(end_uid, path, eids, len) AS (
      SELECT CAST(35 AS BIGINT), '35', CAST([] AS VARCHAR[]), 0
      UNION ALL
      SELECT e.dst,
             p.path || '→' || CAST(e.dst AS VARCHAR),
             list_append(p.eids, CAST(e.src AS VARCHAR) || '→' || CAST(e.dst AS VARCHAR)),
             p.len + 1
      FROM paths p JOIN edges e ON e.src = p.end_uid
      WHERE p.len < 3
        AND NOT list_contains(p.eids, CAST(e.src AS VARCHAR) || '→' || CAST(e.dst AS VARCHAR))
    )
    SELECT path, CAST(len AS INTEGER) AS path_length
    FROM paths WHERE len > 0
    ORDER BY path
    """,
    tags=("graph",),
)
def graph_path_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 at scale: all relationship-unique paths 1..3 from node 35; the
    oracle re-enumerates them with a recursive CTE carrying edge lists."""
    calls, nodes = as_call_tables(derived_edges(spark, sf_dir))
    seeds = spark.createDataFrame([("35",)], "uid string")
    paths = enumerate_paths(calls, nodes, seeds, direction="out", max_depth=3)
    return paths.select(
        F.concat_ws("→", "node_names").alias("path"), "path_length"
    ).orderBy("path")


@register(
    "graph_cycle_detection",
    oracle=f"""
    WITH RECURSIVE
    all_edges AS ({SQL_EDGES}),
    edges AS (SELECT * FROM all_edges WHERE src <> dst),
    walk(origin, cur, depth) AS (
      SELECT src, src, 0 FROM (SELECT DISTINCT src FROM all_edges WHERE src % 20 = 0)
      UNION
      SELECT w.origin, e.dst, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.cur
      WHERE w.depth < 6
    )
    SELECT origin AS uid, CAST(min(depth) AS INTEGER) AS cycle_length
    FROM walk WHERE cur = origin AND depth >= 2
    GROUP BY origin
    ORDER BY uid
    """,
    tags=("graph",),
)
def graph_cycle_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 at scale: shortest cycle (2..6) back to each seed node; oracle
    via recursive CTE over (origin, current) pairs.  Self-loops are
    excluded on both sides (indirect_recursion's rel-unique semantics —
    a loop walked twice is not a Neo4j cycle of length 2)."""
    edges = derived_edges(spark, sf_dir)
    calls, _nodes = as_call_tables(edges)
    seeds = (
        edges.select("src").distinct().filter(F.col("src") % 20 == 0)
        .select(F.col("src").cast("string").alias("uid"))
    )
    out = indirect_recursion(calls, seeds, max_depth=6)
    return out.select(F.col("uid").cast("long").alias("uid"), "cycle_length").orderBy("uid")


from ..plans.graph_project import SQL_SPARSE_EDGES, sparse_edges  # noqa: E402


@register(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE
    raw AS ({SQL_SPARSE_EDGES}),
    edges AS (SELECT src AS x, dst AS y FROM raw UNION SELECT dst, src FROM raw),
    reach(x, y) AS (
      SELECT x, y FROM edges
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON e.x = r.y
    ),
    labels AS (SELECT x AS node, least(x, min(y)) AS cluster_id FROM reach GROUP BY x)
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(max(node) AS BIGINT) AS max_node
    FROM labels GROUP BY cluster_id ORDER BY cluster_id
    """,
    tags=("graph",),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly connected components of the sparse derived call graph
    (undirected closure of CALLS): per-component roster keyed by the
    minimum member — the same min-label propagation / union-find
    operator the dedup pipeline uses for near-dup clustering, applied
    to the graph surface. The oracle recomputes the closure with a
    recursive CTE."""
    from ..operators.dedup import connected_components

    edges = sparse_edges(spark, sf_dir)
    pairs = edges.select(F.col("src").alias("doc_a"), F.col("dst").alias("doc_b"))
    cc = connected_components(pairs)
    return (
        cc.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.max("doc_id").cast("long").alias("max_node"),
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Remaining reference shapes: G4/G8/G9, O2, F4, A4/A5, fallback rows
# ---------------------------------------------------------------------------


@register(
    "mg_caller_sequences",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_HELPER_A}', '{UID_MAIN_A}',   'main',   '0x401010', 'Direct', 1),
      ('{UID_HELPER_A}', '{UID_WORKER_A}', 'worker', '0x401210', 'Direct', 2)
    ) AS t(function_uid, peer_uid, peer_name, "offset", call_type, "order")
    ORDER BY "order"
    """,
    tags=("graph",),
)
def mg_caller_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: caller sequences — in-edges of helper(A) ordered by raw offset
    string with an order counter (call_path_analyzer.rs:433-500)."""
    t = graph_tables(spark)
    return call_sequences(
        t["calls"], t["functions"], F.col("uid") == UID_HELPER_A, direction="in"
    ).orderBy("order")


@register(
    "mg_path_histogram",
    oracle="""
    SELECT * FROM (VALUES (1, CAST(2 AS BIGINT)), (2, CAST(1 AS BIGINT)), (3, CAST(2 AS BIGINT)))
    AS t(path_length, n_paths) ORDER BY path_length
    """,
    tags=("graph",),
)
def mg_path_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4/A5: depth histogram of enumerated paths (the reference's
    client-side HashMap count, src/commands/query.rs:442-452)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_MAIN_A).select("uid")
    paths = enumerate_paths(t["calls"], t["functions"], seeds, direction="out", max_depth=3)
    return (
        paths.groupBy("path_length")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy("path_length")
    )


@register(
    "mg_longest_paths_top10",
    oracle="""
    SELECT * FROM (VALUES
      ('main→helper→worker→helper', 3),
      ('main→helper→worker→worker', 3),
      ('main→helper→worker',        2),
      ('main→CreateFileA',          1),
      ('main→helper',               1)
    ) AS t(path, path_length) ORDER BY path_length DESC, path
    """,
    tags=("graph",),
)
def mg_longest_paths_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4/K5: top-10 longest paths, sorted by length desc
    (src/commands/query.rs:454-458)."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_MAIN_A).select("uid")
    paths = enumerate_paths(t["calls"], t["functions"], seeds, direction="out", max_depth=3)
    return (
        paths.select(F.concat_ws("→", "node_names").alias("path"), "path_length")
        .orderBy(F.desc("path_length"), "path")
        .limit(10)
    )


@register(
    "mg_enhanced_callgraph",
    oracle=f"""
    SELECT * FROM (VALUES
      ('CreateFileA', CAST(1 AS BIGINT)),
      ('helper',      CAST(1 AS BIGINT))
    ) AS t(callee_name, n_calls) ORDER BY callee_name
    """,
    tags=("graph",),
)
def mg_enhanced_callgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G8/A4: call-frequency aggregation per callee of main(A)
    (call_path_analyzer.rs:166-174). After the pair-collapsing CALLS
    MERGE the count is per distinct callee (SURVEY.md §7.3 #7 —
    parallel-edge modeling intentionally not enabled)."""
    t = graph_tables(spark)
    callees = t["calls"].filter(F.col("src_uid") == UID_MAIN_A)
    fn = t["functions"].select(F.col("uid").alias("dst_uid"), F.col("name").alias("callee_name"))
    return (
        callees.join(fn, "dst_uid")
        .groupBy("callee_name")
        .agg(F.count(F.lit(1)).alias("n_calls"))
        .orderBy("callee_name")
    )


@register(
    "mg_paths_fallback",
    oracle="""
    SELECT * FROM (VALUES
      ('CreateFileA', '0x1000', 'Entry', 0)
    ) AS t(path, address, call_type, path_length)
    """,
    tags=("graph",),
)
def mg_paths_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 quirk: a function with NO outgoing paths yields one synthetic
    single-node path with address '0x1000' and call_type 'Entry'
    (call_path_analyzer.rs:96-107) — replicated exactly."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_CREATEFILE).select("uid")
    paths = enumerate_paths(t["calls"], t["functions"], seeds, direction="out", max_depth=3)
    real = paths.select(
        F.concat_ws("→", "node_names").alias("path"),
        F.element_at("node_addresses", -1).alias("address"),
        F.lit("Call").alias("call_type"),
        "path_length",
    )
    fallback = (
        seeds.join(paths.select("start_uid").distinct(),
                   seeds.uid == F.col("start_uid"), "left_anti")
        .join(t["functions"].select("uid", "name"), "uid")
        .select(
            F.col("name").alias("path"),
            F.lit("0x1000").alias("address"),
            F.lit("Entry").alias("call_type"),
            F.lit(0).alias("path_length"),
        )
    )
    return real.unionByName(fallback)


@register(
    "mg_display_projection",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}', 'aaaaaaaaaaaaaaa'),
      ('{UID_CREATEFILE}', 'shared')
    ) AS t(uid, binary_display) ORDER BY uid
    """,
    tags=("graph",),
)
def mg_display_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: uid → binary-prefix display ('imp:*' → 'shared', else the
    hash prefix CAPPED AT 15 CHARS — the reference slices
    ``&uid[..colon_pos.min(15)]``, src/commands/query.rs:248-257, so a
    64-char sha256 prefix displays as its first 15 chars)."""
    t = graph_tables(spark)
    fns = t["functions"].filter(F.col("uid").isin(UID_MAIN_A, UID_CREATEFILE))
    return fns.select(
        "uid",
        F.when(F.col("uid").startswith("imp:"), F.lit("shared"))
        .otherwise(F.substring(F.substring_index("uid", ":", 1), 1, 15))
        .alias("binary_display"),
    ).orderBy("uid")


# ---------------------------------------------------------------------------
# J4 xref, G9 context insights, A2 stats, F3 empty pattern
# ---------------------------------------------------------------------------


@register(
    "mg_xref_address",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}',   'main',     '{UID_HELPER_A}', 'helper', '0x401010', 'Direct', 'call'),
      ('{UID_HELPER_A}', 'helper',   '{UID_WORKER_A}', 'worker', '0x401110', 'Direct', 'call'),
      ('{UID_WORKER_A}', 'worker',   '{UID_HELPER_A}', 'helper', '0x401210', 'Direct', 'call')
    ) AS t(src_uid, src_name, dst_uid, dst_name, "offset", call_type, kind)
    ORDER BY src_uid, dst_uid
    """,
    tags=("graph",),
)
def mg_xref_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: cross-references touching address 0x401100 (helper) — edges in
    or out of that address, queried in decimal form to exercise
    normalization (importer.rs:552-602)."""
    from ..operators.xref import xref_address

    t = graph_tables(spark)
    return xref_address(t["calls"], t["functions"], t["imports"], "4198656").orderBy(
        "src_uid", "dst_uid"
    )


@register(
    "mg_xref_import_arm",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}', 'main', '{UID_CREATEFILE}', 'CreateFileA', '0x401020', 'Indirect', 'call'),
      ('{HASH_A}', '<binary>', '{UID_CREATEFILE}', 'CreateFileA', '0x405000', 'Import', 'import')
    ) AS t(src_uid, src_name, dst_uid, dst_name, "offset", call_type, kind)
    ORDER BY kind
    """,
    tags=("graph",),
)
def mg_xref_import_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 with binary scope: the IAT-address UNION arm fires for import
    addresses (importer.rs:555-568). 0x405000 is CreateFileA's IAT slot
    in binary A; the call arm matches nothing at that address but the
    call INTO the import node appears via the import-node address ''
    — exactly the reference's dual-arm shape."""
    from ..operators.xref import xref_address

    t = graph_tables(spark)
    calls_arm = xref_address(t["calls"], t["functions"], t["imports"], "0x405000",
                             binary_hash=HASH_A)
    # plus calls touching the import node itself (uid-level xref)
    into_import = (
        t["calls"].filter(F.col("dst_uid") == UID_CREATEFILE)
        .join(t["functions"].select(F.col("uid").alias("src_uid"),
                                    F.col("name").alias("src_name")), "src_uid")
        .select("src_uid", "src_name",
                F.col("dst_uid"), F.lit("CreateFileA").alias("dst_name"),
                "offset", "call_type", F.lit("call").alias("kind"))
    )
    return calls_arm.unionByName(into_import).dropDuplicates().orderBy("kind")


@register(
    "mg_call_context_insights",
    oracle="""
    SELECT * FROM (VALUES
      ('downward_paths', CAST(3 AS BIGINT)),
      ('upward_chains',  CAST(4 AS BIGINT)),
      ('callers',        CAST(2 AS BIGINT)),
      ('callees',        CAST(1 AS BIGINT))
    ) AS t(metric, n) ORDER BY metric
    """,
    tags=("graph",),
)
def mg_call_context_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G9: call-context composition for helper(A) at depth 2 — the
    insight counts the reference renders as text
    (call_path_analyzer.rs:503-538, call_path.rs:209-223).
    helper: down = helper→worker, →worker→helper, →worker→worker;
    up = main, worker, helper→worker→helper, worker→worker→helper."""
    from ..operators.xref import call_context

    t = graph_tables(spark)
    ctx = call_context(t["calls"], t["functions"], F.col("uid") == UID_HELPER_A, max_depth=2)
    return ctx["insights"].orderBy("metric")


@register(
    "mg_global_stats",
    oracle="""
    SELECT * FROM (VALUES
      ('binaries', 'node', CAST(2 AS BIGINT)),
      ('functions', 'node', CAST(6 AS BIGINT)),
      ('strings', 'node', CAST(3 AS BIGINT)),
      ('libraries', 'node', CAST(1 AS BIGINT)),
      ('contains', 'relationship', CAST(4 AS BIGINT)),
      ('imports', 'relationship', CAST(2 AS BIGINT)),
      ('imports_library', 'relationship', CAST(2 AS BIGINT)),
      ('belongs_to', 'relationship', CAST(1 AS BIGINT)),
      ('calls', 'relationship', CAST(5 AS BIGINT)),
      ('contains_string', 'relationship', CAST(4 AS BIGINT))
    ) AS t(label, kind, n) ORDER BY label
    """,
    tags=("graph",),
)
def mg_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: global node/relationship stats over the warehouse
    (connection.rs:55-81, importer.rs:27-80)."""
    from ..operators.xref import global_stats

    t = graph_tables(spark)
    return global_stats(t).orderBy("label")


@register(
    "mg_empty_pattern_matches_all",
    oracle="""
    SELECT CAST(6 AS BIGINT) AS n_functions
    """,
    tags=("graph",),
)
def mg_empty_pattern_matches_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: the empty pattern CONTAINS-matches every function
    (query.rs:113-136; '' → Lucene *)."""
    from ..operators.search import search_functions

    t = graph_tables(spark)
    out = search_functions(t["functions"], t["contains"], t["imports"], "", limit=1000)
    return out.agg(F.count(F.lit(1)).alias("n_functions"))


@register(
    "mg_paths_scoped",
    oracle="""
    SELECT * FROM (VALUES
      ('main→helper',               1),
      ('main→helper→worker',        2),
      ('main→helper→worker→helper', 3),
      ('main→helper→worker→worker', 3)
    ) AS t(path, path_length) ORDER BY path_length, path
    """,
    tags=("graph",),
)
def mg_paths_scoped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 per-binary variant: every path node must belong to the binary
    (`ALL(n IN nodes(path)) …`, call_path_analyzer.rs:34). Scoped to
    CONTAINS-members only, the import-node branch (main→CreateFileA)
    disappears while the internal paths survive."""
    t = graph_tables(spark)
    seeds = t["functions"].filter(F.col("uid") == UID_MAIN_A).select("uid")
    members = t["contains"].filter(F.col("binary_hash") == HASH_A).select(
        F.col("function_uid").alias("uid")
    )
    paths = enumerate_paths(
        t["calls"], t["functions"], seeds, direction="out", max_depth=3, members=members
    )
    return paths.select(
        F.concat_ws("→", "node_names").alias("path"), "path_length"
    ).orderBy("path_length", "path")
