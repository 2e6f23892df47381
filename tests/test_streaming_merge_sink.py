"""Streaming MERGE INTO sink (streaming/merge_sink.py) — the
foreachBatch CDC-apply pattern: feed → merge_into per version under
txn idempotency.

Invariants: the replica equals the source after any drain; a replayed
micro-batch publishes nothing (crash contract); a checkpoint restart
applies only NEW versions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.sources.cdf_stream import (
    register_warehouse_cdf_datasource,
)
from binaryx_graph_spark.sources.warehouse import Warehouse
from binaryx_graph_spark.streaming.merge_sink import (
    apply_changes_merge_into,
    cdf_merge_into_apply,
)


def _fns(spark, n=400):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_apply_equals_source(spark, tmp_path):
    src = Warehouse(spark, str(tmp_path / "src"))
    src.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    src.update_where_dv(
        "functions", [("size", "between", (10, 19))], {"name": F.lit("u")}
    )
    src.delete_where_dv("functions", [("uid", "=", "100")])
    src.merge_batch_incremental(
        {"functions": spark.createDataFrame(
            [("900001", "new", "", 1, "Internal")],
            "uid string, name string, address string, size long, type string",
        )},
        batch_seq=2,
    )
    cdf_merge_into_apply(
        spark, str(tmp_path / "src"), "functions", str(tmp_path / "dst"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    dst = Warehouse(spark, str(tmp_path / "dst"))
    assert _rows(dst.read("functions")) == _rows(src.read("functions"))


def test_checkpoint_restart_applies_only_new_versions(spark, tmp_path):
    src = Warehouse(spark, str(tmp_path / "src"))
    src.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    cdf_merge_into_apply(
        spark, str(tmp_path / "src"), "functions", str(tmp_path / "dst"),
        checkpoint=ckpt,
    )
    dst = Warehouse(spark, str(tmp_path / "dst"))
    v_after_first = dst.versions("functions")[-1]
    # no new source commits: a re-drain must publish NOTHING
    cdf_merge_into_apply(
        spark, str(tmp_path / "src"), "functions", str(tmp_path / "dst"),
        checkpoint=ckpt,
    )
    assert dst.versions("functions")[-1] == v_after_first
    # one new source commit → exactly the new change applies
    src.update_where_dv(
        "functions", [("uid", "=", "7")], {"size": F.lit(777777).cast("long")}
    )
    cdf_merge_into_apply(
        spark, str(tmp_path / "src"), "functions", str(tmp_path / "dst"),
        checkpoint=ckpt,
    )
    assert _rows(dst.read("functions")) == _rows(src.read("functions"))
    assert (
        dst.read("functions").filter(F.col("size") == 777777).count() == 1
    )


def test_replayed_batch_publishes_nothing(spark, tmp_path):
    """The crash contract, driven directly: foreachBatch re-delivers a
    batch after a crash — the txn'd merges must be zero-write no-ops."""
    src = Warehouse(spark, str(tmp_path / "src"))
    src.merge_batch_incremental({"functions": _fns(spark, 100)}, n_buckets=4)
    src.update_where_dv(
        "functions", [("uid", "=", "5")], {"name": F.lit("u5")}
    )
    dst = Warehouse(spark, str(tmp_path / "dst"))
    dst.initialize()
    # build the exact feed frame the source would deliver (both versions)
    v0 = src.versions("functions")[0]
    full = src.read("functions", version=v0).withColumn(
        "_change", F.lit("insert")
    ).withColumn("_version", F.lit(0))
    ch = src.read_changes("functions", v0, update_images=True).withColumn(
        "_version", F.lit(1)
    )
    feed = full.unionByName(ch)
    d1 = apply_changes_merge_into(dst, "functions", feed)
    assert d1[0]["rows_inserted"] == 100
    assert d1[1]["rows_updated"] == 1
    v = dst.versions("functions")[-1]
    # crash-replay: the SAME batch delivered again
    d2 = apply_changes_merge_into(dst, "functions", feed)
    assert all(
        s == {"rows_updated": 0, "rows_deleted": 0, "rows_inserted": 0}
        for s in d2.values()
    )
    assert dst.versions("functions")[-1] == v
    assert _rows(dst.read("functions")) == _rows(src.read("functions"))


def test_key_churn_applies_correctly(spark, tmp_path):
    src = Warehouse(spark, str(tmp_path / "src"))
    src.merge_batch_incremental({"functions": _fns(spark, 50)}, n_buckets=4)
    # one commit: delete key 30, insert key 900030 (churn, not update)
    src.merge_into(
        "functions",
        spark.createDataFrame([("30",), ("900030",)], "uid string"),
        when_matched_delete=True,
        when_not_matched_insert=True,
    )
    cdf_merge_into_apply(
        spark, str(tmp_path / "src"), "functions", str(tmp_path / "dst"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    dst = Warehouse(spark, str(tmp_path / "dst"))
    assert dst.read("functions").filter(F.col("uid") == "30").count() == 0
    assert dst.read("functions").filter(F.col("uid") == "900030").count() == 1
    assert _rows(dst.read("functions")) == _rows(src.read("functions"))
