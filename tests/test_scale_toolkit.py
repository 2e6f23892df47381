"""Scale-toolkit behaviors: bucketed co-located joins (no Exchange in
the plan), salted skew handling (correct counts), AQE configuration."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.functions.skew import broadcast_salted_join, salted_count
from binaryx_graph_spark.model import load_table

SF = "/root/testdata/sf0.01"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the Exchange —
    the warehouse pattern for repeated co-located merges at scale."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
        li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = _physical_plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_count_matches_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["event_type"]: r["n"] for r in salted_count(ev, "event_type", buckets=16).collect()}
    assert plain == salted


def test_broadcast_salted_join_matches_plain(spark):
    ev = load_table(spark, SF, "events").select("event_id", "event_type")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "event_type string, type_code int",
    )
    plain = ev.join(dim, "event_type").count()
    salted = broadcast_salted_join(ev, dim, "event_type", buckets=8).count()
    assert plain == salted


def test_aqe_and_skew_join_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
