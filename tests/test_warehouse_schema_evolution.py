"""Schema evolution through the manifest: allow_new_columns=True adds
columns without rewriting history — the manifest pins the evolved
StructType, old files read the new columns as typed nulls, and every
reader (read, scan, read_changes, compaction) honors the pin.

The hard invariants: untouched files are NEVER rewritten by an
evolution commit; time travel returns each version's OWN schema;
missing columns and type changes raise loudly — evolution is adds-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import Warehouse

OLD = "uid string, name string, address string, size long, type string"
NEW = OLD + ", lang string"


def _old(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", v, "Internal") for k, v in rows], OLD
    )


def _new(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", v, "Internal", lang) for k, v, lang in rows], NEW
    )


def _stat_map(root, table):
    from pathlib import Path

    return {
        str(p): (p.stat().st_size, p.stat().st_mtime_ns)
        for p in (Path(root) / table).rglob("*")
        if p.is_file()
    }


def test_incremental_evolution_adds_column_without_rewrites(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch_incremental({"functions": _old(spark, [(k, k) for k in range(300)])})
    v0 = wh.versions("functions")[-1]
    before = _stat_map(root, "functions")
    wh.merge_batch_incremental(
        {"functions": _new(spark, [(1, 11, "rust"), (999, 9, "go")])},
        batch_seq=2,
        allow_new_columns=True,
    )
    after = _stat_map(root, "functions")
    assert set(before) <= set(after), "evolution must only ADD files"
    assert all(after[p] == before[p] for p in before), "no pre-existing file rewritten"

    live = wh.read("functions")
    assert "lang" in live.columns
    rows = {r["uid"]: (r["size"], r["lang"]) for r in live.collect()}
    assert rows["1"] == (11, "rust") and rows["999"] == (9, "go")
    assert rows["7"] == (7, None), "old rows read the new column as null"
    # time travel: the pre-evolution version keeps its own schema
    old = wh.read("functions", version=v0)
    assert "lang" not in old.columns
    # a later batch WITHOUT the new column is now missing a stored col
    with pytest.raises(ValueError, match="missing stored columns"):
        wh.merge_batch_incremental(
            {"functions": _old(spark, [(2, 2)])}, batch_seq=3
        )


def test_evolution_requires_flag_and_rejects_type_changes(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _old(spark, [(1, 1)])})
    with pytest.raises(ValueError, match="allow_new_columns"):
        wh.merge_batch_incremental(
            {"functions": _new(spark, [(2, 2, "c")])}, batch_seq=2
        )
    retyped = spark.createDataFrame(
        [("3", "fn_3", "", "wide", "Internal")],
        "uid string, name string, address string, size string, type string",
    )
    with pytest.raises(ValueError, match="changes column types"):
        wh.merge_batch_incremental(
            {"functions": retyped}, batch_seq=2, allow_new_columns=True
        )


def test_flat_merge_evolution_and_rollback_restores_schema(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch({"functions": _old(spark, [(k, k) for k in range(20)])})
    v0 = wh.versions("functions")[-1]
    wh.merge_batch(
        {"functions": _new(spark, [(1, 11, "zig")])},
        batch_seq=2,
        allow_new_columns=True,
    )
    assert "lang" in wh.read("functions").columns
    wh.rollback("functions", v0)
    assert "lang" not in wh.read("functions").columns, (
        "rollback must restore the pre-evolution schema, not carry the head's"
    )
    # the evolved version remains readable with ITS schema
    assert "lang" in wh.read("functions", version=v0 + 1).columns


def test_cdc_across_evolution_reports_only_real_changes(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _old(spark, [(k, k) for k in range(200)])})
    v0 = wh.versions("functions")[-1]
    wh.merge_batch_incremental(
        {"functions": _new(spark, [(5, 55, "ml")])},
        batch_seq=2,
        allow_new_columns=True,
    )
    v1 = wh.versions("functions")[-1]
    ch = wh.read_changes("functions", v0, v1).collect()
    ins = {(r["uid"], r["size"], r["lang"]) for r in ch if r["_change"] == "insert"}
    dels = {(r["uid"], r["size"], r["lang"]) for r in ch if r["_change"] == "delete"}
    assert ins == {("5", 55, "ml")}
    assert dels == {("5", 5, None)}, (
        "rows sharing the changed bucket must not appear: their null lang "
        "aligns on both sides"
    )


def test_compaction_preserves_evolved_values_in_mixed_buckets(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _old(spark, [(k, k) for k in range(300)])})
    wh.merge_batch_incremental(
        {"functions": _new(spark, [(k, k, f"l{k}") for k in range(0, 300, 7)])},
        batch_seq=2,
        allow_new_columns=True,
    )
    expected = sorted(
        (r["uid"], r["size"], r["lang"]) for r in wh.read("functions").collect()
    )
    out = wh.optimize(target_bytes=1 << 30)  # compact every bucket to 1 file
    assert out["functions"][1] <= out["functions"][0]
    got = sorted(
        (r["uid"], r["size"], r["lang"]) for r in wh.read("functions").collect()
    )
    assert got == expected, "compacting a mixed-schema bucket must keep values"


def test_scan_on_evolved_column_is_exact(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _old(spark, [(k, k) for k in range(200)])})
    wh.merge_batch_incremental(
        {"functions": _new(spark, [(7, 7, "rust"), (11, 11, "go")])},
        batch_seq=2,
        allow_new_columns=True,
    )
    got, diag = wh.scan("functions", [("lang", "=", "rust")], with_diagnostics=True)
    assert [(r["uid"], r["lang"]) for r in got.collect()] == [("7", "rust")]
    exp = wh.read("functions").filter(F.col("lang") == "rust")
    assert got.count() == exp.count() == 1
    assert diag["files_read"] <= diag["files_total"]
