"""Deterministic call-graph projections of the relational testdata
(FIXTURES.md §5 'graph traversals use a call-graph projection').

The traversal operators are graph-generic; to oracle-check them at any
scale factor we derive edge lists from ``orders`` with modular arithmetic
reproducible in ANSI SQL (DuckDB recursive CTEs are the oracle's
traversal engine).

Two graphs:
- ``dense_edges``  : higher fan-out — reachability/cycle checks
- ``node frame``   : synthetic functions table (uid=name=node id string)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import load_table

N_NODES = 500

#: DuckDB twin of :func:`derived_edges` — keep in sync.
SQL_EDGES = (
    "SELECT DISTINCT o_orderkey % 500 AS src, (o_custkey * 13) % 500 AS dst "
    "FROM orders WHERE o_orderkey % 5 = 0"
)


def derived_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) BIGINT edge list — ~3k edges over 500 nodes at sf0.01;
    edge count scales with orders, node set stays fixed → rising density
    exercises frontier dedup exactly like a hot call graph."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .select(
            (F.col("o_orderkey") % N_NODES).alias("src"),
            ((F.col("o_custkey") * 13) % N_NODES).alias("dst"),
        )
        .distinct()
    )


#: DuckDB twin of :func:`sparse_edges` — keep in sync. A 2000-node space
#: with ~orders/13 edges stays FRAGMENTED (many components) at gate
#: scale, unlike the dense 500-node graph which is one giant component.
SQL_SPARSE_EDGES = (
    "SELECT DISTINCT o_orderkey % 2000 AS src, (o_custkey * 17) % 2000 AS dst "
    "FROM orders WHERE o_orderkey % 13 = 0"
)


def sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst) BIGINT edge list over 2000 nodes, ~1/13 of orders —
    sparse enough that connected components are non-trivial."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") % 13 == 0)
        .select(
            (F.col("o_orderkey") % 2000).alias("src"),
            ((F.col("o_custkey") * 17) % 2000).alias("dst"),
        )
        .distinct()
    )


def as_call_tables(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Adapt a (src,dst) frame to the (calls, functions) shape the
    traversal operators consume: uids are the node ids as strings."""
    calls = edges.select(
        F.col("src").cast("string").alias("src_uid"),
        F.col("dst").cast("string").alias("dst_uid"),
        F.lit("").alias("offset"),
        F.lit("Direct").alias("call_type"),
    )
    nodes = (
        edges.select(F.col("src").alias("n"))
        .unionByName(edges.select(F.col("dst").alias("n")))
        .distinct()
        .select(
            F.col("n").cast("string").alias("uid"),
            F.col("n").cast("string").alias("name"),
            F.lit("").alias("address"),
            F.lit(-1).cast("long").alias("size"),
            F.lit("Internal").alias("type"),
        )
    )
    return calls, nodes
