"""Round-11 ADVICE regression suite — five reviewer findings, each
pinned by the failure it named:

1. _commit_catalog's conflict retry must REBASE this commit's pins over
   the head's (re-read each attempt) — a concurrent import_atomic of a
   disjoint table set must not have its pins silently overwritten.
2. merge_into must apply update_where's typed-assignment guard: a
   mistyped update or insert value raises instead of ANSI-off silently
   writing NULL into every matched row.
3. merge_into classifies sides with PRESENCE MARKERS, not key nullness:
   a target row whose merge-key column is NULL is carried, never
   misread as source-only.
4. delete_where_dv's stage dir is named `_dvs_staging_*` so a crash
   between the parquet write and the rename leaves an orphan vacuum's
   `_*_staging_*` sweep ages out.
5. committed_at is clamped monotone per table (Delta's in-commit
   timestamp adjustment): multi-writer clock skew must not let
   TIMESTAMP AS OF resolve past an intermediate version.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from binaryx_graph_spark.sources import warehouse as wh_mod
from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, n=50):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit("fn_"), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


# ------------------------------------ 1. catalog pin rebase on conflict
def test_commit_catalog_rebases_disjoint_pins(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh._commit_catalog({"t1": 3})
    # a later commit carrying ONLY its own table's pin must not drop t1
    wh._commit_catalog({"t2": 5})
    assert wh.catalog_snapshot() == {"t1": 3, "t2": 5}


def test_commit_catalog_conflict_retry_keeps_concurrent_pins(
    spark, tmp_path, monkeypatch
):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh._commit_catalog({"t1": 3})
    real_link = os.link
    state = {"raced": False}

    def racing_link(src, dst, *a, **k):
        # writer B lands its disjoint pin between A's head read and A's
        # publish — A's first attempt loses and must rebase, not replay
        # its stale pin snapshot
        if "_catalog" in str(dst) and not state["raced"]:
            state["raced"] = True
            monkeypatch.setattr(wh_mod.os, "link", real_link)
            wh._commit_catalog({"t2": 5})
            monkeypatch.setattr(wh_mod.os, "link", racing_link)
            raise FileExistsError(dst)
        return real_link(src, dst, *a, **k)

    monkeypatch.setattr(wh_mod.os, "link", racing_link)
    wh._commit_catalog({"t3": 7})
    monkeypatch.setattr(wh_mod.os, "link", real_link)
    assert state["raced"]
    assert wh.catalog_snapshot() == {"t1": 3, "t2": 5, "t3": 7}


# ----------------------------------------- 2. merge_into typed assigns
def test_merge_into_rejects_type_changing_update(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark)})
    src = spark.createDataFrame([("5",)], "uid string")
    with pytest.raises(ValueError, match="changes column types"):
        wh.merge_into(
            "functions",
            src,
            when_matched_update={"size": "abc"},
            when_not_matched_insert=False,
        )
    # nothing committed, no NULLs written
    assert wh.read("functions").filter(F.col("size").isNull()).count() == 0
    # lossless widen (int literal into long) still allowed
    d = wh.merge_into(
        "functions",
        src,
        when_matched_update={"size": 7},
        when_not_matched_insert=False,
    )
    assert d["rows_updated"] == 1
    assert wh.read("functions").filter(F.col("uid") == "5").head()["size"] == 7


def test_merge_into_rejects_mistyped_insert_source(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch({"functions": _fns(spark)})
    bad_src = spark.createDataFrame(
        [("999", "nope")], "uid string, size string"
    )
    with pytest.raises(ValueError, match="insert source column types"):
        wh.merge_into("functions", bad_src, when_not_matched_insert=True)
    assert wh.read("functions").filter(F.col("uid") == "999").count() == 0


# ---------------------------------- 3. NULL-key target rows are carried
def test_merge_into_carries_null_key_target_rows(spark, tmp_path, monkeypatch):
    schema = StructType(
        [
            StructField("k", StringType(), True),
            StructField("v", LongType(), True),
        ]
    )
    monkeypatch.setitem(wh_mod.MERGE_KEYS, "nk", ["k"])
    monkeypatch.setitem(wh_mod.ALL_TABLES, "nk", (schema, ["k"]))
    root = tmp_path / "wh"
    # flat unadopted dir holding a NULL-key row: merge_into adopts it
    spark.createDataFrame(
        [("a", 1), (None, 99), ("b", 2)], schema
    ).coalesce(1).write.parquet(str(root / "nk"))
    wh = Warehouse(spark, str(root))
    src = spark.createDataFrame([("a", 10), ("c", 3)], schema)
    d = wh.merge_into(
        "nk", src, when_matched_update="all", when_not_matched_insert=True
    )
    assert d == {
        "rows_updated": 1,
        "rows_deleted": 0,
        "rows_inserted": 1,
        "buckets_touched": None,
    }
    rows = {
        (r["k"], r["v"]) for r in wh.read("nk").collect()
    }
    # the NULL-key row is CARRIED verbatim — neither dropped (insert arm
    # off would lose it) nor replaced by an all-NULL insert row
    assert rows == {("a", 10), (None, 99), ("b", 2), ("c", 3)}


# --------------------------------------- 4. DV stage dir orphan sweep
def test_dv_stage_crash_orphan_swept_by_vacuum(spark, tmp_path, monkeypatch):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch_incremental({"functions": _fns(spark)})

    import pathlib

    real_rename = pathlib.Path.rename

    def crashing_rename(self, target):
        if str(target).startswith(str(wh._dv_dir("functions"))):
            raise RuntimeError("injected crash before sidecar publish")
        return real_rename(self, target)

    monkeypatch.setattr(pathlib.Path, "rename", crashing_rename)
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.delete_where_dv("functions", [("uid", "=", "5")])
    monkeypatch.setattr(pathlib.Path, "rename", real_rename)
    orphans = [d for d in wh.root.glob("_dvs_staging_*") if d.is_dir()]
    assert orphans, "crashed DV delete must leave a sweepable stage dir"
    wh.vacuum(staging_ttl_hours=0.0)
    assert not [d for d in wh.root.glob("_dvs_staging_*") if d.is_dir()]
    # table unharmed: no manifest was published for the crashed delete
    assert wh.read("functions").filter(F.col("uid") == "5").count() == 1


# ------------------------------------ 5. monotone committed_at stamps
def test_committed_at_clamped_monotone(spark, tmp_path, monkeypatch):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.clear()
    wh.merge_batch_incremental({"functions": _fns(spark, 10)})
    v0 = wh._manifest_versions("functions")[-1]
    t0 = wh._manifest("functions", v0)["committed_at"]

    import time as time_mod

    skewed = t0 - 3600.0  # writer whose wall clock runs an hour behind
    real_time = time_mod.time
    monkeypatch.setattr(time_mod, "time", lambda: skewed)
    wh.merge_batch_incremental(
        {"functions": _fns(spark, 10).withColumn("size", F.lit(123).cast("long"))},
        batch_seq=2,
    )
    monkeypatch.setattr(time_mod, "time", real_time)
    v1 = wh._manifest_versions("functions")[-1]
    t1 = wh._manifest("functions", v1)["committed_at"]
    assert t1 > t0, "committed_at must be strictly monotone per table"
    # TIMESTAMP AS OF at v0's stamp resolves to v0, not past it
    assert wh.version_at("functions", t0) == v0
    assert wh.version_at("functions", t1) == v1
