"""Manifest protocol feature flags (r12 judge directive #3): manifests
stamp ``"features"`` on first use of a reader-required capability (dv /
colmap / schema), the stamp carries forward monotone, pre-r12 manifests
(no key) read as the base protocol, and a manifest naming a feature
this build lacks REFUSES with a clear error instead of mis-reading —
Delta's protocol-version gate.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.sources.warehouse import (
    UnsupportedTableFeatureError,
    Warehouse,
)


def _fns(spark, n=500):
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
    w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=4)
    return w


def _head(wh, table="functions"):
    return wh._manifest(table, wh.versions(table)[-1])


def test_base_protocol_has_no_features(spark, wh):
    assert "features" not in _head(wh)


def test_dv_stamped_on_first_use(spark, wh):
    wh.delete_where_dv("functions", [("size", "<", 100)])
    assert _head(wh).get("features") == ["dv"]


def test_colmap_and_schema_stamped(spark, wh):
    wh.rename_column("functions", "size", "byte_size")
    feats = set(_head(wh).get("features", []))
    assert {"colmap", "schema"} <= feats


def test_features_carry_monotone_across_purge(spark, wh):
    wh.delete_where_dv("functions", [("size", "<", 100)])
    wh.optimize(tables=["functions"])  # purges every DV reference
    m = _head(wh)
    assert not m.get("dvs")  # debt gone...
    assert "dv" in m.get("features", [])  # ...but the flag never drops


def test_old_manifest_without_features_reads_fine(spark, wh):
    # simulate a pre-r12 manifest: strip the key in place
    wh.delete_where_dv("functions", [("uid", "=", "1")])
    v = wh.versions("functions")[-1]
    p = wh._manifest_dir("functions") / f"v{v:05d}.json"
    m = json.loads(p.read_text())
    m.pop("features")
    p.write_text(json.dumps(m, sort_keys=True))
    assert wh.read("functions").count() == 499  # base-protocol read works


def test_unknown_required_feature_refuses_read_and_write(spark, wh):
    v = wh.versions("functions")[-1]
    p = wh._manifest_dir("functions") / f"v{v:05d}.json"
    m = json.loads(p.read_text())
    m["features"] = ["zstd-dict-compression"]
    p.write_text(json.dumps(m, sort_keys=True))
    with pytest.raises(UnsupportedTableFeatureError, match="zstd-dict"):
        wh.read("functions")
    # the WRITE path re-reads the head manifest through the same gate
    with pytest.raises(UnsupportedTableFeatureError):
        wh.delete_where_dv("functions", [("uid", "=", "2")])


def test_stamp_propagates_through_commits(spark, wh):
    wh.delete_where_dv("functions", [("uid", "=", "3")])
    wh.merge_batch_incremental(
        {"functions": _fns(spark, 10)}, batch_seq=2
    )
    assert "dv" in _head(wh).get("features", [])
