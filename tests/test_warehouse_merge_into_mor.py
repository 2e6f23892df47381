"""MERGE INTO, merge-on-read strategy (the r11 default) — matched
update/delete arms DV-tombstone old positions and append only the
changed images; carry rows are never rewritten.

The invariant: strategy='mor' is OBSERVATIONALLY IDENTICAL to
strategy='cow' (read/scan/time travel/CDC agree) while the commit
writes O(changed rows), not O(touched buckets) — measured.
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


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, path):
    w = Warehouse(spark, str(path))
    w.clear()
    w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    return w


def test_mor_merge_equals_cow_merge(spark, tmp_path):
    a = _mk(spark, tmp_path / "a")
    b = _mk(spark, tmp_path / "b")
    va, vb = a.versions("functions")[-1], b.versions("functions")[-1]
    src = spark.createDataFrame(
        [("5", 111), ("6", 222), ("7", 333), ("777777", 999)],
        "uid string, size long",
    )
    kw = dict(
        when_matched_update={"size": F.col("s.size")},
        when_matched_delete=F.col("t.uid") == "7",
        when_not_matched_insert=True,
    )
    da = a.merge_into("functions", src, strategy="mor", **kw)
    db = b.merge_into("functions", src, strategy="cow", **kw)
    assert da == db  # identical outcome counts, identical buckets_touched
    assert da["rows_updated"] == 2 and da["rows_deleted"] == 1
    assert da["rows_inserted"] == 1
    assert _rows(a.read("functions")) == _rows(b.read("functions"))
    assert _rows(a.read("functions", version=va)) == _rows(
        b.read("functions", version=vb)
    )
    assert _rows(a.read_changes("functions", va)) == _rows(
        b.read_changes("functions", vb)
    )


def test_mor_merge_writes_o_changed_rows(spark, tmp_path):
    wh = _mk(spark, tmp_path / "wh")
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    src = spark.createDataFrame([("42", 424242)], "uid string, size long")
    d = wh.merge_into(
        "functions",
        src,
        when_matched_update={"size": F.col("s.size")},
        when_not_matched_insert=False,
    )
    assert d["rows_updated"] == 1
    m1 = wh._manifest("functions", wh.versions("functions")[-1])
    # every pre-merge file kept its exact bytes (nothing rewritten)
    for rel, b in m0["bytes"].items():
        assert m1["bytes"].get(rel) == b
    # the commit's new bytes (sidecar + image file) are tiny vs ONE file
    new_rels = set(m1["bytes"]) - set(m0["bytes"])
    new_bytes = sum(m1["bytes"][r] for r in new_rels)
    dv_files = list(wh._dv_dir("functions").glob("dv-*.parquet"))
    assert len(dv_files) == 1
    min_file = min(m0["bytes"].values())
    assert new_bytes + dv_files[0].stat().st_size < min_file * 2
    got = wh.read("functions").filter(F.col("uid") == "42").collect()
    assert len(got) == 1 and got[0]["size"] == 424242
    assert wh.read("functions").count() == 2000


def test_mor_merge_delete_only_appends_nothing(spark, tmp_path):
    wh = _mk(spark, tmp_path / "wh")
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    src = spark.createDataFrame([("9",), ("10",)], "uid string")
    d = wh.merge_into(
        "functions",
        src,
        when_matched_delete=True,
        when_not_matched_insert=False,
    )
    assert d["rows_deleted"] == 2 and d["rows_inserted"] == 0
    m1 = wh._manifest("functions", wh.versions("functions")[-1])
    assert set(m1["bytes"]) == set(m0["bytes"])  # no appended files
    assert m1.get("dvs"), "delete-only MOR merge must record DVs"
    assert wh.read("functions").count() == 1998


def test_mor_merge_insert_only_has_no_dvs(spark, tmp_path):
    wh = _mk(spark, tmp_path / "wh")
    src = spark.createDataFrame(
        [("888888", "fresh", "", 1, "Internal")],
        "uid string, name string, address string, size long, type string",
    )
    d = wh.merge_into("functions", src)  # default: update arm off
    assert d["rows_inserted"] == 1 and d["rows_updated"] == 0
    m1 = wh._manifest("functions", wh.versions("functions")[-1])
    assert not m1.get("dvs"), "insert-only merge must not write a sidecar"
    assert list(wh._dv_dir("functions").glob("dv-*.parquet")) == []
    assert wh.read("functions").count() == 2001


def test_mor_merge_stacks_with_dv_dml_and_compaction(spark, tmp_path):
    wh = _mk(spark, tmp_path / "wh")
    wh.delete_where_dv("functions", [("uid", "=", "100")])
    wh.update_where_dv("functions", [("uid", "=", "101")], {"size": F.lit(1).cast("long")})
    src = spark.createDataFrame(
        [("100", 5), ("101", 6), ("102", 7)], "uid string, size long"
    )
    d = wh.merge_into(
        "functions", src, when_matched_update={"size": F.col("s.size")}
    )
    # uid=100 was tombstoned → NOT matched → re-inserted (Delta semantics)
    assert d["rows_inserted"] == 1
    assert d["rows_updated"] == 2  # 101 (its DV image) and 102
    got = {
        r["uid"]: r["size"]
        for r in wh.read("functions")
        .filter(F.col("uid").isin("100", "101", "102"))
        .collect()
    }
    assert got == {"100": 5, "101": 6, "102": 7}
    before = _rows(wh.read("functions"))
    wh.optimize(target_bytes=1 << 30)
    m = wh._manifest("functions", wh.versions("functions")[-1])
    assert not m.get("dvs")
    assert _rows(wh.read("functions")) == before


def test_mor_merge_txn_idempotent_replay(spark, tmp_path):
    wh = _mk(spark, tmp_path / "wh")
    src = spark.createDataFrame([("11", 4242999)], "uid string, size long")
    kw = dict(
        when_matched_update={"size": F.col("s.size")},
        when_not_matched_insert=False,
        txn=("merger", 1),
    )
    d1 = wh.merge_into("functions", src, **kw)
    assert d1["rows_updated"] == 1
    v = wh.versions("functions")[-1]
    n_dv = len(list(wh._dv_dir("functions").glob("dv-*.parquet")))
    d2 = wh.merge_into("functions", src, **kw)
    assert d2["rows_updated"] == 0
    assert wh.versions("functions")[-1] == v
    # replay must not leak an orphan sidecar reference
    assert (
        len(list(wh._dv_dir("functions").glob("dv-*.parquet"))) == n_dv
    )
    assert wh.read("functions").filter(F.col("size") == 4242999).count() == 1


def test_mor_merge_on_flat_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark, 300)})
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    src = spark.createDataFrame(
        [("5", 111), ("999", 222)], "uid string, size long"
    )
    d = wh.merge_into(
        "functions", src, when_matched_update={"size": F.col("s.size")}
    )
    assert d["rows_updated"] == 1 and d["rows_inserted"] == 1
    m1 = wh._manifest("functions", wh.versions("functions")[-1])
    for rel, b in m0["bytes"].items():
        assert m1["bytes"].get(rel) == b  # flat files carried, not rewritten
    assert wh.read("functions").count() == 301
    assert (
        wh.read("functions").filter(F.col("uid") == "5").head()["size"] == 111
    )


def test_by_source_arms_full_sync(spark, tmp_path):
    """Delta's WHEN NOT MATCHED BY SOURCE: the full-sync idiom — one
    merge makes the target exactly mirror the source (update matches,
    insert new, delete everything the source no longer has)."""
    wh = _mk(spark, tmp_path / "wh")
    src = spark.range(100, 150).select(
        F.col("id").cast("string").alias("uid"),
        (F.col("id") + 5000).cast("long").alias("size"),
    )
    d = wh.merge_into(
        "functions",
        src,
        when_matched_update={"size": F.col("s.size")},
        when_not_matched_insert=False,  # all src keys exist here
        when_not_matched_by_source_delete=True,
    )
    assert d["rows_updated"] == 50
    assert d["rows_deleted"] == 1950  # everything outside the source
    live = wh.read("functions")
    assert live.count() == 50
    assert live.filter(F.col("size") < 5000).count() == 0


def test_by_source_update_with_condition(spark, tmp_path):
    wh = _mk(spark, tmp_path / "wh")
    src = spark.createDataFrame([("5", 111)], "uid string, size long")
    d = wh.merge_into(
        "functions",
        src,
        when_matched_update={"size": F.col("s.size")},
        when_not_matched_insert=False,
        when_not_matched_by_source_update={"type": "Stale"},
        when_not_matched_by_source_condition=F.col("t.size") < 10,
    )
    assert d["rows_updated"] == 1 + 9  # the match + rows 0..9 minus uid 5
    live = wh.read("functions")
    assert live.filter(F.col("type") == "Stale").count() == 9
    assert live.filter(F.col("uid") == "5").head()["size"] == 111
    assert live.count() == 2000  # nothing deleted or inserted


def test_by_source_mor_equals_cow(spark, tmp_path):
    a = _mk(spark, tmp_path / "a")
    b = _mk(spark, tmp_path / "b")
    src = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("uid"),
        (F.col("id") + 9000).cast("long").alias("size"),
    )
    kw = dict(
        when_matched_update={"size": F.col("s.size")},
        when_not_matched_insert=False,
        when_not_matched_by_source_delete=F.col("t.size") >= 1900,
        when_not_matched_by_source_update={"name": F.lit("leftover")},
    )
    da = a.merge_into("functions", src, strategy="mor", **kw)
    db = b.merge_into("functions", src, strategy="cow", **kw)
    assert da == db
    assert da["rows_deleted"] == 100  # sizes 1900..1999
    assert da["rows_updated"] == 1000 + 900  # matches + leftover updates
    assert _rows(a.read("functions")) == _rows(b.read("functions"))
