"""DV-density auto-compaction policy (maybe_optimize) — checking is
metadata-only, the O(table) rewrite runs only when a trigger fires,
and a fired trigger purges the merge-on-read debt it measured.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, n=2000):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    w.clear()
    w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    return w


def test_no_debt_no_rewrite(spark, wh):
    v = wh.versions("functions")[-1]
    assert wh.maybe_optimize("functions") is None
    assert wh.versions("functions")[-1] == v  # checking commits nothing
    s = wh.dv_stats("functions")
    assert s["files_dvd"] == 0 and s["tombstone_rows"] == 0


def test_dv_fraction_trigger_fires_and_resets(spark, wh):
    # tombstone a spread of rows so many files carry a DV entry
    wh.delete_where_dv("functions", [("size", "between", (0, 999))])
    s = wh.dv_stats("functions")
    assert s["dv_fraction"] >= 0.2 and s["tombstone_rows"] == 1000
    before = sorted(tuple(r) for r in wh.read("functions").collect())
    d = wh.maybe_optimize("functions", target_bytes=1 << 30)
    assert d is not None and "dv_file_fraction" in d["triggers"]
    assert "functions" in d["optimized"]
    # debt purged, content intact
    s2 = wh.dv_stats("functions")
    assert s2["files_dvd"] == 0 and s2["tombstone_rows"] == 0
    assert sorted(tuple(r) for r in wh.read("functions").collect()) == before
    assert wh.maybe_optimize("functions", target_bytes=1 << 30) is None


def test_stack_depth_trigger(spark, wh):
    # 4 stacked point deletes on the same key bucket
    for uid in ("8", "16", "24", "32"):  # same bucket keys not guaranteed;
        wh.delete_where_dv("functions", [("uid", "=", uid)])
    s = wh.dv_stats("functions")
    d = wh.maybe_optimize(
        "functions",
        target_bytes=1 << 30,
        dv_file_fraction=1.1,  # disarm the fraction trigger
        max_dv_stack=max(1, s["max_stack"]),
    )
    assert d is not None and "max_dv_stack" in d["triggers"]
    assert wh.dv_stats("functions")["max_stack"] == 0


def test_small_file_trigger_without_dvs(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch_incremental({"functions": _fns(spark, 200)}, n_buckets=4)
    # many tiny MOR insert appends → fragmentation with zero DV debt
    for i in range(6):
        src = _fns(spark, 200).withColumn(
            "uid", F.concat(F.lit(f"b{i}_"), F.col("uid"))
        )
        wh.merge_into("functions", src)  # insert-only, appends files
    assert wh.dv_stats("functions")["files_dvd"] == 0
    d = wh.maybe_optimize(
        "functions", target_bytes=1 << 30, dv_file_fraction=1.1,
        max_dv_stack=10_000, small_file_factor=4,
    )
    assert d is not None and d["triggers"] == ["small_file_factor"]
    fb, fa = d["optimized"]["functions"]
    assert fa < fb
    assert wh.read("functions").count() == 1400


def test_only_the_named_table_is_touched(spark, wh):
    wh.merge_batch_incremental(
        {"calls": spark.createDataFrame(
            [(f"s{i}", f"d{i}", "0x1", "Direct") for i in range(50)],
            "src_uid string, dst_uid string, offset string, call_type string",
        )},
    )
    v_calls = wh.versions("calls")[-1]
    wh.delete_where_dv("functions", [("size", "between", (0, 999))])
    d = wh.maybe_optimize("functions", target_bytes=1 << 30)
    assert d is not None and list(d["optimized"]) == ["functions"]
    assert wh.versions("calls")[-1] == v_calls
