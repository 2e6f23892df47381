"""Row-level UPDATE through the manifest: file-granular, key-protected,
CDC reports each updated row as its delete+insert pair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, n):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


def test_update_point_key_is_file_granular(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 3000)})
    v0 = wh.versions("functions")[-1]
    d = wh.update_where(
        "functions", [("uid", "=", "777")], {"size": 999_999, "type": "External"}
    )
    assert d["rows_updated"] == 1
    assert d["files_rewritten"] == 1 < d["files_total"]
    row = wh.read("functions").filter(F.col("uid") == "777").collect()[0]
    assert (row["size"], row["type"], row["name"]) == (999_999, "External", "fn_777")
    assert wh.read("functions").count() == 3000
    ch = wh.read_changes("functions", v0).collect()
    got = {(r["_change"], r["uid"], r["size"]) for r in ch}
    assert got == {("delete", "777", 777), ("insert", "777", 999_999)}


def test_update_with_column_expression(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 500)})
    d = wh.update_where(
        "functions", [("size", "<", 10)], {"size": F.col("size") + 1000}
    )
    assert d["rows_updated"] == 10
    sizes = sorted(
        r["size"] for r in wh.read("functions").filter(F.col("size") >= 1000).collect()
    )
    assert sizes == list(range(1000, 1010))


def test_update_guards(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 50)})
    with pytest.raises(ValueError, match="merge-key"):
        wh.update_where("functions", [("size", "=", 1)], {"uid": "x"})
    with pytest.raises(ValueError, match="unknown columns"):
        wh.update_where("functions", [("size", "=", 1)], {"ghost": 1})
    with pytest.raises(ValueError, match="whole"):
        wh.update_where("functions", [], {"size": 0})
    with pytest.raises(ValueError, match="assignment"):
        wh.update_where("functions", [("size", "=", 1)], {})
    # no-match: metadata untouched
    v0 = wh.versions("functions")[-1]
    d = wh.update_where("functions", [("size", ">", 10**9)], {"type": "X"})
    assert d["rows_updated"] == 0 and wh.versions("functions")[-1] == v0
    # txn replay skips
    wh.update_where("functions", [("uid", "=", "7")], {"type": "A"}, txn=("u", 0))
    wh.update_where("functions", [("uid", "=", "8")], {"type": "B"}, txn=("u", 0))
    rows = {r["uid"]: r["type"] for r in wh.read("functions").collect()}
    assert rows["7"] == "A" and rows["8"] == "Internal"


def test_update_rhs_evaluates_against_old_row(spark, tmp_path):
    """SQL UPDATE semantics: every assignment's RHS (and the predicate)
    sees the OLD row — a chained evaluation where the `size` assignment
    flips the match before `type` is assigned is the bug the gate
    certifier caught."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 100)})
    d = wh.update_where(
        "functions",
        [("size", "between", (10, 19))],
        {"size": F.col("size") + 1_000_000, "type": "External"},
    )
    assert d["rows_updated"] == 10
    updated = wh.read("functions").filter(F.col("type") == "External").collect()
    assert len(updated) == 10, "type must flip on the same rows size moved"
    assert sorted(r["size"] for r in updated) == [1_000_010 + i for i in range(10)]
    # swap semantics: both RHS see old values
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    df = spark.createDataFrame(
        [("1", "n", "a", 5, "T")],
        "uid string, name string, address string, size long, type string",
    )
    wh2.merge_batch_incremental({"functions": df})
    wh2.update_where(
        "functions",
        [("uid", "=", "1")],
        {"name": F.col("address"), "address": F.col("name")},
    )
    r = wh2.read("functions").collect()[0]
    assert (r["name"], r["address"]) == ("a", "n"), "assignments must not chain"
