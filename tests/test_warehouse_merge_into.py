"""MERGE INTO: Delta's three-arm conditional merge on the manifest."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, n=200):
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
    w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    return w


def test_three_arms_and_carry(spark, wh):
    v0 = wh.versions("functions")[-1]
    src = spark.createDataFrame(
        [("5", 500), ("6", -1), ("300", 3000)],
        "uid string, new_size long",
    )
    d = wh.merge_into(
        "functions",
        src,
        when_matched_update={
            "size": F.col("s.new_size"),
            "name": F.upper(F.col("t.name")),
        },
        when_matched_condition=F.col("s.new_size") >= 0,
        when_matched_delete=F.col("s.new_size") < 0,
        when_not_matched_insert=True,
    )
    assert d == {
        "rows_updated": 1, "rows_deleted": 1,
        "rows_inserted": 1, "buckets_touched": d["buckets_touched"],
    }
    assert 1 <= d["buckets_touched"] <= 3
    rows = {
        r["uid"]: (r["name"], r["size"])
        for r in wh.read("functions")
        .filter(F.col("uid").isin("5", "6", "300", "8"))
        .collect()
    }
    assert rows["5"] == ("FN_5", 500)  # matched + condition → update
    assert "6" not in rows  # matched + delete condition → gone
    assert rows["300"] == (None, None)  # inserted; absent cols NULL
    assert rows["8"] == ("fn_8", 8)  # untouched carry
    assert wh.read("functions").count() == 200  # -1 +1
    # CDC across the merge is exactly the three arms
    ch = wh.read_changes("functions", v0)
    got = sorted(
        (r["_change"], r["uid"])
        for r in ch.collect()
    )
    assert got == [
        ("delete", "5"), ("delete", "6"),
        ("insert", "300"), ("insert", "5"),
    ]


def test_update_all_and_insert_off(spark, wh):
    src = spark.createDataFrame(
        [("7", "renamed", "0x7", 777, "Export"), ("999", "ghost", "", 1, "Internal")],
        "uid string, name string, address string, size long, type string",
    )
    d = wh.merge_into(
        "functions", src,
        when_matched_update="all",
        when_not_matched_insert=False,
    )
    assert d["rows_updated"] == 1 and d["rows_inserted"] == 0
    row = wh.read("functions").filter(F.col("uid") == "7").head()
    assert (row["name"], row["size"], row["type"]) == ("renamed", 777, "Export")
    assert wh.read("functions").filter(F.col("uid") == "999").count() == 0


def test_duplicate_source_keys_raise(spark, wh):
    src = spark.createDataFrame(
        [("5", 1), ("5", 2)], "uid string, new_size long"
    )
    with pytest.raises(ValueError, match="duplicate merge keys"):
        wh.merge_into(
            "functions", src,
            when_matched_update={"size": F.col("s.new_size")},
        )


def test_merge_into_respects_dv_and_colmap(spark, wh):
    wh.delete_where_dv("functions", [("uid", "=", "5")])
    wh.rename_column("functions", "size", "byte_size")
    src = spark.createDataFrame(
        [("5", 555), ("6", 666)], "uid string, v long"
    )
    d = wh.merge_into(
        "functions", src,
        when_matched_update={"byte_size": F.col("s.v")},
        when_not_matched_insert=True,
    )
    # '5' is tombstoned → NOT MATCHED → inserted fresh
    assert d["rows_inserted"] == 1 and d["rows_updated"] == 1
    rows = {
        r["uid"]: r["byte_size"]
        for r in wh.read("functions").filter(F.col("uid").isin("5", "6")).collect()
    }
    assert rows == {"5": None, "6": 666}  # insert carries only src cols


def test_merge_into_txn_idempotent(spark, wh):
    src = spark.createDataFrame([("5", 500)], "uid string, new_size long")
    d1 = wh.merge_into(
        "functions", src,
        when_matched_update={"size": F.col("s.new_size")},
        txn=("m", 1),
    )
    v = wh.versions("functions")[-1]
    d2 = wh.merge_into(
        "functions", src,
        when_matched_update={"size": F.col("s.new_size") + 1},
        txn=("m", 1),
    )
    assert d1["rows_updated"] == 1 and d2["rows_updated"] == 0
    assert wh.versions("functions")[-1] == v
    assert wh.read("functions").filter(F.col("uid") == "5").head()["size"] == 500


def test_merge_into_rebases_over_disjoint_concurrent_commit(spark, wh):
    """merge_into declares its touched buckets, so it must rebase over
    a commit that landed on OTHER buckets between its read and its
    publish — same contract as merge_batch_incremental."""
    src = spark.createDataFrame([("5", 555)], "uid string, new_size long")
    m0 = wh._manifest("functions", wh.versions("functions")[-1])

    # interleave: while the merge plan is built against m0, another
    # writer commits a disjoint-bucket batch (key chosen to hash into a
    # different bucket than '5')
    cands = spark.createDataFrame(
        [(f"zz_{i}",) for i in range(40)] + [("5",)], "uid string"
    ).select("uid", wh._key_bucket("functions", m0["n_buckets"]).alias("b"))
    kb = {r["uid"]: r["b"] for r in cands.collect()}
    # pick a patch key that provably hashes into a DIFFERENT bucket
    other = next(u for u, b in kb.items() if u != "5" and b != kb["5"])
    patch = spark.createDataFrame(
        [(other, "fresh", "", 1, "Internal")],
        "uid string, name string, address string, size long, type string",
    )

    # the race: commit the disjoint batch, then run merge_into whose
    # base_version is now stale — _commit_manifest must rebase, not raise
    import binaryx_graph_spark.sources.warehouse as wh_mod

    orig = wh_mod.Warehouse._commit_manifest
    fired = {"done": False}

    def _racy(self, table, *a, **kw):
        if not fired["done"] and kw.get("touched") and table == "functions":
            fired["done"] = True
            wh.merge_batch_incremental({"functions": patch}, batch_seq=9)
        return orig(self, table, *a, **kw)

    wh_mod.Warehouse._commit_manifest = _racy
    try:
        d = wh.merge_into(
            "functions", src,
            when_matched_update={"size": F.col("s.new_size")},
        )
    finally:
        wh_mod.Warehouse._commit_manifest = orig
    assert d["rows_updated"] == 1
    live = wh.read("functions")
    assert live.filter(F.col("uid") == "5").head()["size"] == 555
    assert live.filter(F.col("uid") == other).count() == 1  # both landed
