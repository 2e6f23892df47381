"""Merge-on-read UPDATE (update_where_dv) — Delta's DV+append design.

The invariant everywhere: a DV update is OBSERVATIONALLY IDENTICAL to
the copy-on-write update (read/scan/time travel/CDC all agree), while
the COMMIT writes O(updated rows) instead of O(touched files) —
asserted with measured bytes.
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


def test_dv_update_equals_cow_update(spark, tmp_path):
    """Same update through both lanes → identical state, CDC, travel."""
    a = Warehouse(spark, str(tmp_path / "a"))
    b = Warehouse(spark, str(tmp_path / "b"))
    for w in (a, b):
        w.clear()
        w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    va, vb = a.versions("functions")[-1], b.versions("functions")[-1]
    preds = [("size", "between", (100, 299))]
    assigns = {"name": F.upper(F.col("name")), "size": F.col("size") + 1000}
    da = a.update_where_dv("functions", preds, assigns)
    db = b.update_where("functions", preds, assigns)
    assert da["rows_updated"] == db["rows_updated"] == 200
    assert da["files_rewritten"] == 0 and db["files_rewritten"] > 0
    assert _rows(a.read("functions")) == _rows(b.read("functions"))
    assert _rows(a.scan("functions", [("size", ">=", 1000)])) == _rows(
        b.scan("functions", [("size", ">=", 1000)])
    )
    assert _rows(a.read("functions", version=va)) == _rows(
        b.read("functions", version=vb)
    )
    assert _rows(a.read_changes("functions", va)) == _rows(
        b.read_changes("functions", vb)
    )


def test_dv_update_commit_writes_o_changed_rows(spark, wh):
    """The write-amp claim, measured: a 1-row point update writes a
    tiny sidecar + a tiny image file; CoW would rewrite a whole file."""
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    d = wh.update_where_dv(
        "functions", [("uid", "=", "777")], {"size": F.lit(9).cast("long")}
    )
    assert d["rows_updated"] == 1
    assert d["files_rewritten"] == 0
    min_file = min(m0["bytes"].values())
    assert d["dv_bytes"] < min_file / 2
    assert d["appended_bytes"] < min_file / 2 * 3  # 1-row parquet ≈ footer
    # original data files untouched: old rels keep their exact bytes
    m1 = wh._manifest("functions", wh.versions("functions")[-1])
    for rel, b in m0["bytes"].items():
        assert m1["bytes"].get(rel) == b
    got = wh.read("functions").filter(F.col("uid") == "777").collect()
    assert len(got) == 1 and got[0]["size"] == 9


def test_dv_update_stacked_and_predicates_see_old_row(spark, wh):
    # predicate and RHS evaluate against the OLD row; stacking works
    d1 = wh.update_where_dv(
        "functions", [("size", "between", (100, 109))], {"size": F.col("size") + 10000}
    )
    assert d1["rows_updated"] == 10
    # second update matches the NEW images (they live in appended file)
    d2 = wh.update_where_dv(
        "functions", [("size", ">=", 10000)], {"name": F.lit("touched")}
    )
    assert d2["rows_updated"] == 10
    assert (
        wh.read("functions").filter(F.col("name") == "touched").count() == 10
    )
    assert wh.read("functions").count() == 2000  # no dup, no loss
    # a tombstoned old image must not resurrect through later DML
    wh.delete_where("functions", [("uid", "=", "1999")])
    assert (
        wh.read("functions").filter(F.col("size") >= 10000).count() == 10
    )


def test_dv_update_validation_parity_with_cow(spark, wh):
    with pytest.raises(ValueError, match="no predicates"):
        wh.update_where_dv("functions", [], {"size": 1})
    with pytest.raises(ValueError, match="at least one assignment"):
        wh.update_where_dv("functions", [("uid", "=", "1")], {})
    with pytest.raises(ValueError, match="merge-key"):
        wh.update_where_dv("functions", [("size", "=", 1)], {"uid": "x"})
    with pytest.raises(ValueError, match="unknown columns"):
        wh.update_where_dv("functions", [("size", "=", 1)], {"nope": 1})
    with pytest.raises(ValueError, match="changes column types"):
        wh.update_where_dv("functions", [("uid", "=", "5")], {"size": "abc"})
    # nothing committed by the failures
    assert wh.read("functions").count() == 2000
    assert wh.read("functions").filter(F.col("size").isNull()).count() == 0


def test_dv_update_idempotent_replay(spark, wh):
    t = ("updater", 1)
    d1 = wh.update_where_dv(
        "functions", [("uid", "=", "5")], {"size": F.lit(424242).cast("long")}, txn=t
    )
    assert d1["rows_updated"] == 1
    v = wh.versions("functions")[-1]
    d2 = wh.update_where_dv(
        "functions", [("uid", "=", "5")], {"size": F.lit(424242).cast("long")}, txn=t
    )
    assert d2["rows_updated"] == 0 and d2["dv_bytes"] == 0
    assert wh.versions("functions")[-1] == v
    assert wh.read("functions").filter(F.col("size") == 424242).count() == 1


def test_dv_update_interop_dv_delete_and_compaction(spark, wh):
    wh.delete_where_dv("functions", [("size", "between", (0, 49))])
    d = wh.update_where_dv(
        "functions", [("size", "between", (0, 99))], {"name": F.lit("hit")}
    )
    # tombstoned rows must not match the update
    assert d["rows_updated"] == 50
    before = _rows(wh.read("functions"))
    wh.optimize(target_bytes=1 << 30)
    m = wh._manifest("functions", wh.versions("functions")[-1])
    assert not m.get("dvs"), "compaction must purge update DVs too"
    assert _rows(wh.read("functions")) == before


def test_dv_update_on_flat_table(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark, 500)})
    v0 = wh.versions("functions")[-1]
    d = wh.update_where_dv(
        "functions", [("size", "<", 100)], {"name": F.lit("flat")}
    )
    assert d["rows_updated"] == 100 and d["files_rewritten"] == 0
    assert wh.read("functions").filter(F.col("name") == "flat").count() == 100
    assert wh.read("functions").count() == 500
    assert wh.read("functions", version=v0).filter(
        F.col("name") == "flat"
    ).count() == 0
    ch = wh.read_changes("functions", v0)
    assert ch.filter(F.col("_change") == "insert").count() == 100
    assert ch.filter(F.col("_change") == "delete").count() == 100


def test_dv_update_rebases_over_disjoint_concurrent_commit(spark, wh):
    """update_where_dv declares its touched buckets, so it must rebase
    over a commit that landed on OTHER buckets between its read and its
    publish — same contract as the other bucket-granular writers."""
    m0 = wh._manifest("functions", wh.versions("functions")[-1])
    cands = spark.createDataFrame(
        [(f"zz_{i}",) for i in range(40)] + [("5",)], "uid string"
    ).select("uid", wh._key_bucket("functions", m0["n_buckets"]).alias("b"))
    kb = {r["uid"]: r["b"] for r in cands.collect()}
    other = next(u for u, b in kb.items() if u != "5" and b != kb["5"])
    patch = spark.createDataFrame(
        [(other, "fresh", "", 1, "Internal")],
        "uid string, name string, address string, size long, type string",
    )
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
        d = wh.update_where_dv(
            "functions", [("uid", "=", "5")], {"size": F.lit(424242).cast("long")}
        )
    finally:
        wh_mod.Warehouse._commit_manifest = orig
    assert d["rows_updated"] == 1
    live = wh.read("functions")
    assert live.filter(F.col("uid") == "5").head()["size"] == 424242
    assert live.filter(F.col("uid") == other).count() == 1  # both landed
    assert live.count() == 2001
