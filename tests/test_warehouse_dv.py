"""Deletion vectors (merge-on-read DELETE) — Delta/Iceberg's DV design
on this manifest.

The invariant everywhere: a DV delete is OBSERVATIONALLY IDENTICAL to
the copy-on-write delete (read/scan/time travel/CDC/merge/compaction
all agree), while the COMMIT writes O(deleted rows) instead of
O(touched files) — asserted with measured bytes.
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_dv_delete_equals_cow_delete(spark, tmp_path):
    """Same sequence of deletes through both lanes → identical state,
    identical CDC, identical time travel."""
    a = Warehouse(spark, str(tmp_path / "a"))
    b = Warehouse(spark, str(tmp_path / "b"))
    for w in (a, b):
        w.clear()
        w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    va, vb = a.versions("functions")[-1], b.versions("functions")[-1]
    preds = [("size", "between", (100, 299))]
    da = a.delete_where_dv("functions", preds)
    db = b.delete_where("functions", preds)
    assert da["rows_deleted"] == db["rows_deleted"] == 200
    assert da["files_rewritten"] == 0 and db["files_rewritten"] > 0
    assert _rows(a.read("functions")) == _rows(b.read("functions"))
    assert _rows(a.scan("functions", [("size", "<", 500)])) == _rows(
        b.scan("functions", [("size", "<", 500)])
    )
    assert _rows(a.read("functions", version=va)) == _rows(
        b.read("functions", version=vb)
    )
    assert _rows(a.read_changes("functions", va)) == _rows(
        b.read_changes("functions", vb)
    )


def test_dv_commit_writes_o_deleted_rows_not_o_file(spark, wh):
    """The write-amp claim, measured: a 1-row point delete's sidecar is
    a few hundred bytes; the CoW path would rewrite its whole file."""
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    d = wh.delete_where_dv("functions", [("uid", "=", "777")])
    assert d["rows_deleted"] == 1
    assert d["files_rewritten"] == 0
    # the sidecar is dwarfed by even ONE data file
    min_file = min(m0["bytes"].values())
    assert d["dv_bytes"] < min_file / 2, (
        f"DV sidecar {d['dv_bytes']}B should be far under the smallest "
        f"data file {min_file}B"
    )
    # data files untouched: same rels, same bytes
    m1 = wh._manifest("functions", wh.versions("functions")[-1])
    assert m1["bytes"] == m0["bytes"]
    assert wh.read("functions").filter(F.col("uid") == "777").count() == 0


def test_dv_stacked_deletes_and_idempotent_replay(spark, wh):
    d1 = wh.delete_where_dv("functions", [("size", "between", (100, 199))])
    assert d1["rows_deleted"] == 100
    # overlapping second delete only tombstones the FRESH rows
    d2 = wh.delete_where_dv("functions", [("size", "between", (150, 299))])
    assert d2["rows_deleted"] == 100
    assert wh.read("functions").count() == 1800
    # re-running the same predicate is a no-op and commits nothing
    v = wh.versions("functions")[-1]
    d3 = wh.delete_where_dv("functions", [("size", "between", (100, 299))])
    assert d3["rows_deleted"] == 0 and d3["dv_bytes"] == 0
    assert wh.versions("functions")[-1] == v


def test_dv_rows_do_not_resurrect_through_dml(spark, wh):
    wh.delete_where_dv("functions", [("uid", "=", "500")])
    # CoW delete on the same bucket rewrites it; tombstone must hold
    wh.delete_where("functions", [("uid", "=", "501")])
    assert wh.read("functions").filter(F.col("uid").isin("500", "501")).count() == 0
    # UPDATE must neither match nor resurrect the tombstoned row
    wh.delete_where_dv("functions", [("uid", "=", "600")])
    wh.update_where("functions", [("size", ">=", 0)], {"name": F.upper(F.col("name"))})
    assert wh.read("functions").filter(F.col("uid") == "600").count() == 0
    assert wh.read("functions").filter(F.col("name") == "FN_601").count() == 1
    # incremental merge re-inserting the tombstoned KEY wins (it is a
    # NEW row, Delta semantics); an unrelated merge must not resurrect
    wh.delete_where_dv("functions", [("uid", "=", "700")])
    patch = spark.createDataFrame(
        [("999999", "fresh", "", 1, "Internal")],
        "uid string, name string, address string, size long, type string",
    )
    wh.merge_batch_incremental({"functions": patch})
    assert wh.read("functions").filter(F.col("uid") == "700").count() == 0
    assert wh.read("functions").filter(F.col("uid") == "999999").count() == 1


def test_optimize_purges_dvs_and_preserves_content(spark, wh):
    wh.delete_where_dv("functions", [("size", "between", (0, 99))])
    before = _rows(wh.read("functions"))
    wh.optimize(target_bytes=1 << 30)
    m = wh._manifest("functions", wh.versions("functions")[-1])
    assert not m.get("dvs"), "compaction must purge deletion vectors"
    assert _rows(wh.read("functions")) == before


def test_vacuum_sweeps_expired_dv_sidecars(spark, wh):
    wh.delete_where_dv("functions", [("uid", "=", "1")])
    wh.delete_where_dv("functions", [("uid", "=", "2")])
    dvdir = wh._dv_dir("functions")
    assert len(list(dvdir.glob("dv-*.parquet"))) == 2
    # compaction purges the references; vacuum then sweeps the files
    wh.optimize(target_bytes=1 << 30)
    wh.vacuum(keep_last=0, staging_ttl_hours=0)
    assert list(dvdir.glob("dv-*.parquet")) == []
    assert wh.read("functions").count() == 1998


def test_rollback_across_dv_commit(spark, wh):
    v_pre = wh.versions("functions")[-1]
    wh.delete_where_dv("functions", [("size", "between", (0, 499))])
    v_del = wh.versions("functions")[-1]
    wh.rollback("functions", v_pre)
    assert wh.read("functions").count() == 2000  # un-deleted
    wh.rollback("functions", v_del)
    assert wh.read("functions").count() == 1500  # re-deleted


def test_dv_delete_on_flat_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark, 500)})
    v0 = wh.versions("functions")[-1]
    d = wh.delete_where_dv("functions", [("size", "<", 100)])
    assert d["rows_deleted"] == 100 and d["files_rewritten"] == 0
    assert wh.read("functions").count() == 400
    assert wh.read("functions", version=v0).count() == 500
    ch = wh.read_changes("functions", v0)
    assert ch.filter(F.col("_change") == "insert").count() == 0
    assert ch.filter(F.col("_change") == "delete").count() == 100


def test_cdf_stream_sees_dv_deletes(spark, tmp_path):
    import uuid

    from binaryx_graph_spark.sources.cdf_stream import (
        register_warehouse_cdf_datasource,
    )

    root = str(tmp_path / "wh_cdf")
    wh = Warehouse(spark, root)
    register_warehouse_cdf_datasource(spark)
    wh.merge_batch_incremental({"functions": _fns(spark, 500)}, n_buckets=8)
    d = wh.delete_where_dv("functions", [("size", "between", (10, 29))])
    assert d["rows_deleted"] == 20 and d["files_rewritten"] == 0

    name = f"cdf_dv_{uuid.uuid4().hex[:10]}"
    (
        spark.readStream.format("warehouse_cdf")
        .option("root", root)
        .option("table", "functions")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.table(name)
    c = {
        (r["_version"], r["_change"]): r["n"]
        for r in got.groupBy("_version", "_change")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # v0 = the snapshot; v1 = the DV-only commit (file lists unchanged —
    # the feed must still surface exactly the tombstoned rows)
    assert c == {(0, "insert"): 500, (1, "delete"): 20}
    dels = got.filter("_version = 1")
    assert sorted(r["uid"] for r in dels.collect()) == sorted(
        str(i) for i in range(10, 30)
    )
