"""Bucketed managed tables: co-located joins eliminate the shuffle.

The cluster-scale co-location story the warehouse docstring promises,
proven at the PLAN level: joining two tables bucketed on the join key
must produce a SortMergeJoin with NO Exchange on either side (bucket
layout satisfies the distribution requirement), while the identical
join over plain parquet shuffles both sides."""

from __future__ import annotations

import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.model import load_table

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_eliminates_exchange(spark):
    suffix = uuid.uuid4().hex[:8]
    to, tl = f"orders_b_{suffix}", f"lineitem_b_{suffix}"
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    try:
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .mode("overwrite").format("parquet").saveAsTable(to)
        )
        (
            lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .mode("overwrite").format("parquet").saveAsTable(tl)
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            bucketed = spark.table(to).join(
                spark.table(tl), spark.table(to).o_orderkey == spark.table(tl).l_orderkey
            )
            plain = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            pb, pp = _plan(bucketed), _plan(plain)
            assert "SortMergeJoin" in pb and "Exchange" not in pb, pb
            assert "Exchange" in pp  # the non-bucketed twin shuffles
            # same row count either way — co-location changes the plan only
            assert bucketed.count() == plain.count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {to}")
        spark.sql(f"DROP TABLE IF EXISTS {tl}")
