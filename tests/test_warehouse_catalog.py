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
