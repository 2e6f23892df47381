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


def test_interval_bin_join_equals_nlj(spark):
    """The binned equi-join range join returns EXACTLY the rows of the
    naive non-equi formulation — including intervals straddling bins,
    facts on interval boundaries (start inclusive, end exclusive), and
    empty intervals."""
    from binaryx_graph_spark.operators.temporal import interval_bin_join
    from pyspark.sql import functions as F

    facts = spark.createDataFrame(
        [(i, f"2024-01-01 {h:02d}:{m:02d}:00") for i, (h, m) in enumerate(
            [(0, 0), (5, 59), (6, 0), (9, 30), (11, 0), (15, 44), (15, 45), (23, 59)]
        )],
        "fid int, ts_s string",
    ).select("fid", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [("a", "2024-01-01 09:30:00", "2024-01-01 15:45:00"),   # straddles 6h bins
         ("b", "2024-01-01 00:00:00", "2024-01-01 06:00:00"),   # bin-aligned
         ("c", "2024-01-01 22:00:00", "2024-01-01 22:00:01"),   # 1-second window
         ("d", "2024-01-02 00:00:00", "2024-01-02 01:00:00")],  # no facts
        "wid string, s_s string, e_s string",
    ).select("wid", F.to_timestamp("s_s").alias("s"), F.to_timestamp("e_s").alias("e"))

    binned = {
        (r.fid, r.wid)
        for r in interval_bin_join(facts, "ts", iv, "s", "e", bin_seconds=21600).collect()
    }
    naive = {
        (r.fid, r.wid)
        for r in facts.join(
            iv, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
        ).collect()
    }
    assert binned == naive
    assert (3, "a") in binned and (6, "a") not in binned  # boundary semantics


def test_interval_bin_join_extra_keys(spark):
    """extra_keys joins entity alongside the bin: same-time facts of a
    DIFFERENT entity never match."""
    from binaryx_graph_spark.operators.temporal import interval_bin_join
    from pyspark.sql import functions as F

    facts = spark.createDataFrame(
        [(1, 7, "2024-01-01 10:00:00"), (2, 8, "2024-01-01 10:00:00")],
        "fid int, uid int, ts_s string",
    ).select("fid", "uid", F.to_timestamp("ts_s").alias("ts"))
    iv = spark.createDataFrame(
        [("w", 7, "2024-01-01 09:00:00", "2024-01-01 11:00:00")],
        "wid string, uid int, s_s string, e_s string",
    ).select("wid", "uid", F.to_timestamp("s_s").alias("s"), F.to_timestamp("e_s").alias("e"))
    got = {
        (r.fid, r.wid)
        for r in interval_bin_join(
            facts, "ts", iv, "s", "e", bin_seconds=3600, extra_keys=["uid"]
        ).collect()
    }
    assert got == {(1, "w")}


def test_interval_bin_join_fuzz(spark):
    """Randomized equivalence: binned equi-join == naive non-equi join
    for arbitrary fact times, interval placements, and bin widths."""
    import random

    from binaryx_graph_spark.operators.temporal import interval_bin_join
    from pyspark.sql import functions as F

    rnd = random.Random(20260814)
    base = 1_700_000_000
    for bin_seconds in (7, 3600):
        facts_rows = [
            (i, base + rnd.randrange(0, 5000)) for i in range(60)
        ]
        iv_rows = []
        for w in range(25):
            s = base + rnd.randrange(0, 5000)
            iv_rows.append((w, s, s + rnd.randrange(1, 900)))
        facts = spark.createDataFrame(facts_rows, "fid int, es long").select(
            "fid", F.timestamp_seconds("es").alias("ts")
        )
        iv = spark.createDataFrame(iv_rows, "wid int, ss long, ee long").select(
            "wid",
            F.timestamp_seconds("ss").alias("s"),
            F.timestamp_seconds("ee").alias("e"),
        )
        binned = {
            (r.fid, r.wid)
            for r in interval_bin_join(
                facts, "ts", iv, "s", "e", bin_seconds=bin_seconds
            ).collect()
        }
        naive = {
            (r.fid, r.wid)
            for r in facts.join(
                iv, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e"))
            ).collect()
        }
        assert binned == naive, f"bin_seconds={bin_seconds}"


def test_audit_calendar_key_resolution():
    """BNLJ build-bound auditor: calendar-keyed aggregates pass only
    when EVERY key reduces to date_trunc arithmetic — direct, or
    resolved through a defining alias; any raw-column key fails
    (the r4-advice (user_id, date_trunc) hole)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from explain_audit import _keys_all_calendar

    sub = (
        "HashAggregate(keys=[win_start#100, win_end#101], functions=[])\n"
        "  Project [date_trunc(day, cast(ts#5 as timestamp), Some(UTC)) + INTERVAL '09:30' HOUR AS win_start#100, "
        "date_trunc(day, ts#6, Some(UTC)) AS win_end#101]\n"
    )
    # resolved aliases, both calendar -> pass
    assert _keys_all_calendar("win_start#100, win_end#101", sub)
    # direct date_trunc key -> pass
    assert _keys_all_calendar(
        "date_trunc(day, ts#5, Some(UTC))#9", "FileScan parquet [ts#5]"
    )
    # raw column alongside a calendar key -> FAIL (unbounded in users)
    assert not _keys_all_calendar("user_id#7L, win_start#100", sub)
    # alias resolving to a NON-calendar expression -> FAIL
    sub2 = sub + "  Project [concat(a#8, b#9) AS win_start#102]\n"
    assert not _keys_all_calendar("win_start#102", sub2)
    # no date_trunc anywhere -> FAIL
    assert not _keys_all_calendar("k#1", "Project [x#2 AS k#1]")
