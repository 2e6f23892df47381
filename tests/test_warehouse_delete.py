"""Row-level DELETE through the manifest: file-granular rewrites picked
by the skipping stack, one commit, time travel + CDC intact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import Warehouse

SCHEMA = "uid string, name string, address string, size long, type string"


def _fns(spark, n):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


def test_delete_point_key_rewrites_one_bucket_file(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 3000)})
    v0 = wh.versions("functions")[-1]
    d = wh.delete_where("functions", [("uid", "=", "777")])
    assert d["rows_deleted"] == 1
    assert d["files_rewritten"] == 1 < d["files_total"]
    live = wh.read("functions")
    assert live.count() == 2999
    assert live.filter(F.col("uid") == "777").count() == 0
    # time travel still has the row; CDC reports exactly the delete
    assert wh.read("functions", version=v0).count() == 3000
    ch = wh.read_changes("functions", v0).collect()
    assert [(r["uid"], r["_change"]) for r in ch] == [("777", "delete")]


def test_delete_clustered_range_is_file_granular(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark, 20000)})
    wh.optimize(target_bytes=40_000, cluster_by={"functions": ["size"]})
    m = wh._manifest("functions", wh.versions("functions")[-1])
    n_files = len(m["files"])
    d = wh.delete_where("functions", [("size", "between", (100, 300))])
    assert d["rows_deleted"] == 201
    assert d["files_rewritten"] < n_files, "clustered delete must not rewrite all"
    live = wh.read("functions")
    assert live.count() == 20000 - 201
    assert live.filter(F.col("size").between(100, 300)).count() == 0
    # untouched clustered files keep pruning after the delete commit
    _, diag = wh.scan(
        "functions", [("size", "between", (15000, 15100))], with_diagnostics=True
    )
    assert diag["files_read"] < diag["files_total"]


def test_delete_null_predicate_rows_are_kept(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("1", "a", "", 1, "Internal"), ("2", "b", "", None, "Internal")],
        SCHEMA,
    )
    wh.merge_batch_incremental({"functions": df})
    d = wh.delete_where("functions", [("size", "<", 100)])
    assert d["rows_deleted"] == 1
    rows = {(r["uid"], r["size"]) for r in wh.read("functions").collect()}
    assert rows == {("2", None)}, "NULL predicate = no match = row kept"


def test_delete_no_match_is_metadata_only(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 500)})
    v0 = wh.versions("functions")[-1]
    d = wh.delete_where("functions", [("size", ">", 10_000_000)])
    assert d == {"files_total": d["files_total"], "files_rewritten": 0, "rows_deleted": 0}
    assert wh.versions("functions")[-1] == v0, "no-match delete publishes nothing"


def test_delete_requires_predicates_and_supports_txn(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 100)})
    with pytest.raises(ValueError, match="whole table"):
        wh.delete_where("functions", [])
    d1 = wh.delete_where("functions", [("uid", "=", "7")], txn=("purge", 0))
    assert d1["rows_deleted"] == 1
    d2 = wh.delete_where("functions", [("uid", "=", "8")], txn=("purge", 0))
    assert d2["rows_deleted"] == 0, "replayed txn version must skip"
    assert wh.read("functions").filter(F.col("uid") == "8").count() == 1
