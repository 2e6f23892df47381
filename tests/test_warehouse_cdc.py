"""CDC between warehouse versions: Warehouse.read_changes.

The invariant: from − deletes + inserts == to, as an exact multiset —
checked here with exceptAll in both directions.  The scale property:
on bucketed manifests at one modulus, only CHANGED buckets' files are
read (manifest diff), asserted via the diagnostics hook."""

from __future__ import annotations

from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import Warehouse

SCHEMA = "uid string, name string, address string, size long, type string"


def _fns(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", v, "Internal") for k, v in rows], SCHEMA
    )


def _changes(wh, table, v0, v1=None):
    df, diag = wh.read_changes(table, v0, v1, with_diagnostics=True)
    rows = df.collect()
    ins = {(r["uid"], r["size"]) for r in rows if r["_change"] == "insert"}
    dels = {(r["uid"], r["size"]) for r in rows if r["_change"] == "delete"}
    return ins, dels, diag


def _assert_apply_identity(wh, table, v0, v1):
    ch = wh.read_changes(table, v0, v1)
    old = wh.read(table, version=v0)
    new = wh.read(table, version=v1)
    ins = ch.filter(F.col("_change") == "insert").drop("_change")
    dels = ch.filter(F.col("_change") == "delete").drop("_change")
    rebuilt = old.exceptAll(dels).unionByName(ins)
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_bucketed_update_is_delete_plus_insert(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(500)])}
    )
    v0 = wh.versions("functions")[-1]
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(7, 999_999), (500, 1)])}, batch_seq=2
    )
    v1 = wh.versions("functions")[-1]
    ins, dels, diag = _changes(wh, "functions", v0, v1)
    assert ins == {("7", 999_999), ("500", 1)}
    assert dels == {("7", 7)}
    assert 1 <= diag["buckets_read"] <= 2 < diag["buckets_total"]
    _assert_apply_identity(wh, "functions", v0, v1)


def test_unchanged_row_rewrite_reports_nothing(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(100)])}
    )
    v0 = wh.versions("functions")[-1]
    # merge the SAME row values: the bucket is rewritten, the rows equal
    wh.merge_batch_incremental({"functions": _fns(spark, [(7, 7)])}, batch_seq=2)
    v1 = wh.versions("functions")[-1]
    ins, dels, diag = _changes(wh, "functions", v0, v1)
    assert ins == set() and dels == set()
    assert diag["buckets_read"] >= 1  # the bucket WAS rewritten


def test_changes_span_multiple_commits(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(200)])}
    )
    v0 = wh.versions("functions")[-1]
    wh.merge_batch_incremental({"functions": _fns(spark, [(1, 11)])}, batch_seq=2)
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(1, 111), (300, 3)])}, batch_seq=3
    )
    v2 = wh.versions("functions")[-1]
    ins, dels, _ = _changes(wh, "functions", v0, v2)
    assert ins == {("1", 111), ("300", 3)}
    assert dels == {("1", 1)}
    _assert_apply_identity(wh, "functions", v0, v2)


def test_flat_table_changes(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch({"functions": _fns(spark, [(k, k) for k in range(50)])})
    v0 = wh.versions("functions")[-1]
    wh.merge_batch({"functions": _fns(spark, [(3, 33)])}, batch_seq=2)
    v1 = wh.versions("functions")[-1]
    ins, dels, diag = _changes(wh, "functions", v0, v1)
    assert ins == {("3", 33)} and dels == {("3", 3)}
    assert diag == {"buckets_total": None, "buckets_read": None}
    _assert_apply_identity(wh, "functions", v0, v1)


def test_changes_across_rebucket_fall_back_exact(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(200)])}
    )
    v0 = wh.versions("functions")[-1]
    wh.rebucket("functions", 128)
    wh.merge_batch_incremental({"functions": _fns(spark, [(5, 55)])}, batch_seq=2)
    v1 = wh.versions("functions")[-1]
    ins, dels, diag = _changes(wh, "functions", v0, v1)
    assert ins == {("5", 55)} and dels == {("5", 5)}
    assert diag == {"buckets_total": None, "buckets_read": None}
    _assert_apply_identity(wh, "functions", v0, v1)


def test_compaction_commit_reports_no_changes(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for s in range(1, 4):
        wh.merge_batch_incremental(
            {"functions": _fns(spark, [(k, k * s) for k in range(100)])},
            batch_seq=s,
        )
    v0 = wh.versions("functions")[-1]
    wh.optimize(target_bytes=1 << 30)  # 1-file buckets: layout-only commit
    v1 = wh.versions("functions")[-1]
    if v1 != v0:  # compaction actually rewrote something
        df = wh.read_changes("functions", v0, v1)
        assert df.count() == 0
