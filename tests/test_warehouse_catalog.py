"""Catalog-level multi-table atomic commit.

A graph import writes many tables; per-table manifests alone can
publish a torn middle on a crash.  The catalog commit pins
{table: version} in ONE atomic object: snapshot readers see the
complete old import or the complete new one — never functions without
their calls."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, n, tag="a_"):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.concat(F.lit(tag), F.col("id")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


def _calls(spark, n):
    return spark.range(n).select(
        F.col("id").cast("string").alias("src_uid"),
        F.col("id").cast("string").alias("dst_uid"),
        F.lit("0x0").alias("offset"),
        F.lit("Direct").alias("call_type"),
    )


def test_crash_between_table_commits_is_invisible_to_snapshots(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.import_atomic(
        {"functions": _fns(spark, 100), "calls": _calls(spark, 100)},
        txn=("imp", 1),
    )
    pins0 = wh.catalog_snapshot()
    assert set(pins0) == {"functions", "calls"}

    # crash after the FIRST table commit ('calls' sorts first)
    with pytest.raises(RuntimeError, match="injected crash"):
        wh.import_atomic(
            {"functions": _fns(spark, 200, "b_"), "calls": _calls(spark, 200)},
            txn=("imp", 2),
            batch_seq=2,
            _crash_after=1,
        )
    # catalog untouched: snapshot readers see the COMPLETE old import
    assert wh.catalog_snapshot() == pins0
    assert wh.read_snapshot("functions").count() == 100
    assert wh.read_snapshot("calls").count() == 100
    # (the live per-table head IS torn — that is exactly what the
    # catalog protects snapshot readers from)
    assert wh.read("calls").count() == 200
    assert wh.read("functions").count() == 100

    # retry with the SAME txn converges: committed tables replay as
    # no-ops, the rest commit, the catalog pin publishes
    v2 = wh.import_atomic(
        {"functions": _fns(spark, 200, "b_"), "calls": _calls(spark, 200)},
        txn=("imp", 2),
        batch_seq=2,
    )
    pins2 = wh.catalog_snapshot()
    assert wh.read_snapshot("functions", pins2).count() == 200
    assert wh.read_snapshot("calls", pins2).count() == 200
    # the interrupted table was NOT double-merged on retry
    assert wh.read_snapshot("calls", pins2).filter(
        F.col("src_uid") == "5"
    ).count() == 1

    # re-running the whole import is an end-to-end no-op
    v3 = wh.import_atomic(
        {"functions": _fns(spark, 200, "b_"), "calls": _calls(spark, 200)},
        txn=("imp", 2),
        batch_seq=2,
    )
    assert v3 == v2
    assert wh.catalog_versions()[-1] == v2


def test_catalog_pins_carry_untouched_tables(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.import_atomic({"functions": _fns(spark, 50)}, txn=("imp", 1))
    f_pin = wh.catalog_snapshot()["functions"]
    wh.import_atomic({"calls": _calls(spark, 50)}, txn=("imp", 2))
    pins = wh.catalog_snapshot()
    assert pins["functions"] == f_pin  # carried, not dropped
    assert "calls" in pins
    # a never-pinned table falls back to the live head
    assert wh.read_snapshot("functions", pins).count() == 50


def test_timestamp_time_travel(spark, tmp_path):
    import time

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 100)}, n_buckets=4)
    v0 = wh.versions("functions")[-1]
    ts0 = wh._manifest("functions", v0)["committed_at"]
    time.sleep(0.05)
    wh.delete_where_dv("functions", [("size", "<", 20)])
    v1 = wh.versions("functions")[-1]
    ts1 = wh._manifest("functions", v1)["committed_at"]
    assert ts1 > ts0
    # TIMESTAMP AS OF: at/after each commit's publish time
    assert wh.read("functions", timestamp=ts0).count() == 100
    assert wh.read("functions", timestamp=(ts0 + ts1) / 2).count() == 100
    assert wh.read("functions", timestamp=ts1).count() == 80
    assert wh.read("functions", timestamp=time.time() + 10).count() == 80
    assert wh.version_at("functions", ts1) == v1
    # before the first commit: loud error, never a silent other state
    with pytest.raises(FileNotFoundError, match="no version at or before"):
        wh.read("functions", timestamp=ts0 - 100)
    with pytest.raises(ValueError, match="not both"):
        wh.read("functions", version=v0, timestamp=ts0)


def test_engine_snapshot_cypher_sees_consistent_import(spark, tmp_path):
    from binaryx_graph_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh"))
    e.warehouse.import_atomic(
        {"functions": _fns(spark, 50), "calls": _calls(spark, 50)},
        txn=("t", 1),
        incremental=False,
    )
    # live head advances mid-import (simulated: direct merges without pin)
    e.warehouse.merge_batch(
        {"calls": _calls(spark, 80), "functions": _fns(spark, 80)}, batch_seq=2
    )
    live = e.cypher("MATCH ()-[r:CALLS]->() RETURN count(r) AS n").head()["n"]
    snap = e.cypher(
        "MATCH ()-[r:CALLS]->() RETURN count(r) AS n", snapshot=True
    ).head()["n"]
    assert live == 80 and snap == 50


def test_vacuum_retention_guard_for_registered_consumers(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, 50)}, n_buckets=4)
    for i in range(2, 7):  # five more commits
        wh.merge_batch_incremental(
            {"functions": _fns(spark, 50, tag=f"b{i}_")}, batch_seq=i
        )
    mvs = wh._manifest_versions("functions")
    assert len(mvs) == 6
    # a lagging consumer parked at the SECOND version
    wh.register_consumer("replica_eu", "functions", mvs[1])
    wh.vacuum(keep_last=1, staging_ttl_hours=0)
    kept = wh._manifest_versions("functions")
    # everything from the consumer's offset onward survives keep_last=1
    assert kept == mvs[1:]
    # its next diff is still computable
    assert wh.read_changes("functions", mvs[1], mvs[2]).count() > 0
    # consumer advances to head → re-vacuum reclaims the tail
    wh.register_consumer("replica_eu", "functions", kept[-1])
    wh.vacuum(keep_last=1, staging_ttl_hours=0)
    assert len(wh._manifest_versions("functions")) == 2  # head + keep_last
    # offsets are monotone
    with pytest.raises(ValueError, match="BACKWARD"):
        wh.register_consumer("replica_eu", "functions", 0)


def test_replicate_registers_consumer_offset(spark, tmp_path):
    from binaryx_graph_spark.sources.replication import replicate

    src = Warehouse(spark, str(tmp_path / "src"))
    dst = Warehouse(spark, str(tmp_path / "dst"))
    src.merge_batch_incremental({"functions": _fns(spark, 30)}, n_buckets=4)
    off = str(tmp_path / "offsets.json")
    replicate(src, dst, "functions", off)
    head = src._manifest_versions("functions")[-1]
    assert src.consumer_offsets("functions") == {"cdc_replication": head}
    assert dst.read("functions").count() == 30
