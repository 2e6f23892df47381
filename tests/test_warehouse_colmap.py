"""Column mapping: rename / drop / type-widen as METADATA-ONLY commits
(Delta column mapping on this manifest).

Invariants: zero data bytes move (asserted via the manifest byte map);
old versions time-travel with their own names/types/columns; renames
are zero-CDC; every reader and writer speaks logical names while the
skipping stack (zone maps, blooms, bucket hash) stays physical."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from binaryx_graph_spark.sources import warehouse as wh_mod
from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, n=300):
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
    w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=4)
    return w


def test_rename_is_metadata_only_and_time_travels(spark, wh):
    v0 = wh.versions("functions")[-1]
    m0 = wh._manifest("functions", v0)
    v1 = wh.rename_column("functions", "size", "byte_size")
    m1 = wh._manifest("functions", v1)
    assert m1["bytes"] == m0["bytes"], "rename must move zero data bytes"
    assert m1["buckets"] == m0["buckets"]
    assert wh.read("functions").columns == [
        "uid", "name", "type", "address", "byte_size",
    ]
    # old version keeps the old name
    assert "size" in wh.read("functions", version=v0).columns
    # rename is ZERO-CDC (metadata-only — no row changed)
    assert wh.read_changes("functions", v0, v1).count() == 0
    # scan via the new name: pruning still engages (physical stats)
    got, diag = wh.scan(
        "functions", [("byte_size", "<", 10)], with_diagnostics=True
    )
    assert got.count() == 10
    assert wh.table_schema("functions")["byte_size"].dataType == LongType()


def test_writes_speak_logical_names_after_rename(spark, wh):
    wh.rename_column("functions", "size", "byte_size")
    patch = spark.createDataFrame(
        [("7", "fn_7new", "", 777, "Internal")],
        "uid string, name string, address string, byte_size long, type string",
    )
    wh.merge_batch_incremental({"functions": patch}, batch_seq=2)
    assert (
        wh.read("functions").filter("uid = '7'").head()["byte_size"] == 777
    )
    d = wh.update_where("functions", [("byte_size", "=", 777)], {"byte_size": 778})
    assert d["rows_updated"] == 1
    d = wh.delete_where_dv("functions", [("byte_size", "=", 778)])
    assert d["rows_deleted"] == 1
    assert wh.read("functions").filter("uid = '7'").count() == 0
    # a batch still naming the OLD column raises (missing stored column)
    stale = spark.createDataFrame(
        [("8", "fn_8", "", 8, "Internal")],
        "uid string, name string, address string, size long, type string",
    )
    with pytest.raises(ValueError, match="renamed-away"):
        wh.merge_batch_incremental({"functions": stale}, batch_seq=3)


def test_rename_twice_and_back(spark, wh):
    wh.rename_column("functions", "size", "a")
    wh.rename_column("functions", "a", "b")
    assert "b" in wh.read("functions").columns
    wh.rename_column("functions", "b", "size")  # back to the birth name
    m = wh._manifest("functions", wh.versions("functions")[-1])
    assert not m.get("colmap"), "identity mapping must clear the overlay"
    assert "size" in wh.read("functions").columns


def test_drop_column_hides_without_rewrites(spark, wh):
    v0 = wh.versions("functions")[-1]
    m0 = wh._manifest("functions", v0)
    v1 = wh.drop_column("functions", "address")
    m1 = wh._manifest("functions", v1)
    assert m1["bytes"] == m0["bytes"], "drop must move zero data bytes"
    assert "address" not in wh.read("functions").columns
    assert "address" in wh.read("functions", version=v0).columns
    with pytest.raises(ValueError, match="merge-key"):
        wh.drop_column("functions", "uid")
    # merges now supply the narrower schema
    patch = spark.createDataFrame(
        [("7", "fn_7new", 7, "Internal")],
        "uid string, name string, size long, type string",
    )
    wh.merge_batch_incremental({"functions": patch}, batch_seq=2)
    assert wh.read("functions").filter("uid = '7'").head()["name"] == "fn_7new"


def test_widen_column_reads_narrow_files(spark, tmp_path, monkeypatch):
    schema = StructType(
        [
            StructField("id", StringType()),
            StructField("val", IntegerType()),
        ]
    )
    monkeypatch.setitem(wh_mod.MERGE_KEYS, "metrics_w", ["id"])
    monkeypatch.setitem(wh_mod.ALL_TABLES, "metrics_w", (schema, ["id"]))
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(100).select(
        F.col("id").cast("string").alias("id"),
        F.col("id").cast("int").alias("val"),
    )
    wh.merge_batch_incremental({"metrics_w": df}, n_buckets=4)
    v0 = wh.versions("metrics_w")[-1]
    m0 = wh._manifest("metrics_w", v0)
    v1 = wh.widen_column("metrics_w", "val", "long")
    assert wh._manifest("metrics_w", v1)["bytes"] == m0["bytes"]
    # narrow files promote at read; new wide rows merge in
    assert dict(wh.read("metrics_w").dtypes)["val"] == "bigint"
    big = spark.createDataFrame([("x", 2**40)], "id string, val long")
    wh.merge_batch_incremental({"metrics_w": big}, batch_seq=2)
    got = wh.read("metrics_w")
    assert got.count() == 101
    assert got.agg(F.max("val")).collect()[0][0] == 2**40
    # time travel reads the narrow type
    assert dict(wh.read("metrics_w", version=v0).dtypes)["val"] == "int"
    # lossy widening refused; merge-key widening refused
    with pytest.raises(ValueError, match="not a lossless widening"):
        wh.widen_column("metrics_w", "val", "int")
    with pytest.raises(ValueError, match="merge-key"):
        wh.widen_column("metrics_w", "id", "string")
    # bigint → double is LOSSY past 2^53 and must refuse too
    with pytest.raises(ValueError, match="not a lossless widening"):
        wh.widen_column("metrics_w", "val", "double")


def test_mapping_composes_with_dv_and_cdf_stream(spark, tmp_path):
    import uuid

    from binaryx_graph_spark.sources.cdf_stream import (
        register_warehouse_cdf_datasource,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 100)}, n_buckets=4)
    v0 = wh.versions("functions")[-1]
    wh.rename_column("functions", "size", "byte_size")
    wh.delete_where_dv("functions", [("byte_size", "between", (10, 19))])
    # CDC across rename+DV delete: exactly the deletes, in TO-schema
    ch = wh.read_changes("functions", v0)
    assert ch.filter("_change = 'insert'").count() == 0
    assert ch.filter("_change = 'delete'").count() == 10
    assert "byte_size" in ch.columns
    # the stream (started after the rename) speaks logical names
    register_warehouse_cdf_datasource(spark)
    name = f"cm_cdf_{uuid.uuid4().hex[:8]}"
    (
        spark.readStream.format("warehouse_cdf")
        .option("root", str(wh.root))
        .option("table", "functions")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    t = spark.table(name)
    assert "byte_size" in t.columns
    c = {
        (r["_version"], r["_change"]): r["n"]
        for r in t.groupBy("_version", "_change").agg(F.count("*").alias("n")).collect()
    }
    # v0 snapshot, v1 rename (zero rows), v2 the DV delete
    assert c == {(0, "insert"): 100, (2, "delete"): 10}
