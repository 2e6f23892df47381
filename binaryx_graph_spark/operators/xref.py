"""Cross-reference and composite analysis operators (SURVEY.md §2.5 J4,
§2.6 G9, §2.8 A2).

J4 (importer.rs:552-602): find every call edge whose source OR target
address equals a queried address; with a binary scope an extra UNION arm
matches import-table (IAT) addresses; DISTINCT overall.

G9 (call_path_analyzer.rs:503-538): call-context composition — upward
chains + downward paths + caller sequences for one function, plus the
text "insights" counts (src/models/call_path.rs:209-223).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.addr import normalize_address_py
from .traverse import call_sequences, enumerate_paths


def xref_address(
    calls: DataFrame,
    functions: DataFrame,
    imports: DataFrame,
    address: str,
    *,
    binary_hash: str | None = None,
) -> DataFrame:
    """J4: cross-references touching an address →
    (src_uid, src_name, dst_uid, dst_name, offset, call_type, kind).

    kind ∈ {'call', 'import'}; the 'import' arm only joins when a binary
    scope is given (the reference's `CALL { … UNION … }`,
    importer.rs:555-568); final DISTINCT (importer.rs:569)."""
    # normalize the queried address the same way stored addresses were —
    # a pure-Python scalar transform (twin of the Column kernel, pinned by
    # tests); launching a Spark job for one string would be wasteful
    norm = normalize_address_py(address)
    if norm is None:
        norm = address

    fn = functions.select(
        F.col("uid"), F.col("name"), F.col("address").alias("_faddr")
    )
    src_fn = fn.select(
        F.col("uid").alias("src_uid"), F.col("name").alias("src_name"),
        F.col("_faddr").alias("_saddr"),
    )
    dst_fn = fn.select(
        F.col("uid").alias("dst_uid"), F.col("name").alias("dst_name"),
        F.col("_faddr").alias("_daddr"),
    )
    hits = (
        calls.join(src_fn, "src_uid")
        .join(dst_fn, "dst_uid")
        .filter((F.col("_saddr") == norm) | (F.col("_daddr") == norm))
        .select(
            "src_uid", "src_name", "dst_uid", "dst_name", "offset", "call_type",
            F.lit("call").alias("kind"),
        )
    )
    if binary_hash is not None:
        imp_arm = (
            imports.filter(
                (F.col("binary_hash") == binary_hash) & (F.col("address") == norm)
            )
            .join(
                fn.select(F.col("uid").alias("function_uid"), F.col("name").alias("dst_name")),
                "function_uid",
            )
            .select(
                F.col("binary_hash").alias("src_uid"),
                F.lit("<binary>").alias("src_name"),
                F.col("function_uid").alias("dst_uid"),
                "dst_name",
                F.col("address").alias("offset"),
                F.lit("Import").alias("call_type"),
                F.lit("import").alias("kind"),
            )
        )
        hits = hits.unionByName(imp_arm)
    return hits.dropDuplicates()


def call_context(
    calls: DataFrame,
    functions: DataFrame,
    target_pred,
    *,
    max_depth: int = 3,
) -> dict[str, DataFrame]:
    """G9: composition — upward chains, downward paths, caller/callee
    sequences, and the insight counts frame."""
    seeds = functions.filter(target_pred).select("uid")
    down = enumerate_paths(calls, functions, seeds, direction="out", max_depth=max_depth)
    up = enumerate_paths(calls, functions, seeds, direction="in", max_depth=max_depth)
    seq_out = call_sequences(calls, functions, target_pred, direction="out")
    seq_in = call_sequences(calls, functions, target_pred, direction="in")
    insights = (
        down.agg(F.count(F.lit(1)).alias("n")).select(F.lit("downward_paths").alias("metric"), "n")
        .unionByName(up.agg(F.count(F.lit(1)).alias("n")).select(F.lit("upward_chains").alias("metric"), "n"))
        .unionByName(seq_in.agg(F.count(F.lit(1)).alias("n")).select(F.lit("callers").alias("metric"), "n"))
        .unionByName(seq_out.agg(F.count(F.lit(1)).alias("n")).select(F.lit("callees").alias("metric"), "n"))
    )
    return {
        "downward_paths": down,
        "upward_chains": up,
        "callee_sequences": seq_out,
        "caller_sequences": seq_in,
        "insights": insights,
    }


def global_stats(tables: dict[str, DataFrame]) -> DataFrame:
    """A2: total nodes / relationships / per-label counts
    (connection.rs:55-81) over the graph warehouse tables."""
    node_tables = ["binaries", "functions", "strings", "libraries"]
    edge_tables = ["contains", "imports", "imports_library", "belongs_to", "calls", "contains_string"]
    frames = []
    for name in node_tables + edge_tables:
        kind = "node" if name in node_tables else "relationship"
        frames.append(
            tables[name]
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(name).alias("label"), F.lit(kind).alias("kind"), "n")
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out
