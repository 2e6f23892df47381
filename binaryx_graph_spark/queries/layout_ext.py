"""Physical-layout queries: bucketed co-located joins.

Complements layout_zorder_stats (multi-dimensional clustering for scan
pruning) with the OTHER layout lever a 100 TB warehouse pulls: bucketed
tables for shuffle-free repeated joins.  The registered query proves the
property inside the gate — assert_colocated_join raises if the physical
plan contains any Exchange below the join, so a green CORRECTNESS row
certifies both the values and the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.bucketing import colocated_priority_revenue
from ..registry import register


@register(
    "layout_bucketed_join",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                    * CAST(round((1-l_discount)*100) AS BIGINT)) AS BIGINT)
             / 10000.0 AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("layout", "join", "scale"),
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via the bucketed-table layout:
    orders and lineitem are materialized once with
    ``bucketBy(8, orderkey).sortBy(orderkey)``; the join then reads
    matching buckets 1:1 — SortMergeJoin with NO Exchange and NO Sort
    on either side (the operator raises if the plan shows one, so this
    gate row certifies the plan property, not just the values).  The
    oracle is the plain relational join — identical output, paying the
    shuffle the layout avoids."""
    return colocated_priority_revenue(spark, sf_dir)
