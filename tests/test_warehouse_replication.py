"""CDC replication: change-feed consumer + exactly-once apply.

The invariant: after replicate(), the replica equals the source as an
exact multiset — across merges, updates, deletes, and crash-replays."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryx_graph_spark.sources.replication import (
    _write_offset,
    apply_changes,
    replicate,
    stream_changes,
)
from binaryx_graph_spark.sources.warehouse import Warehouse


def _fns(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", v, "Internal") for k, v in rows],
        "uid string, name string, address string, size long, type string",
    )


def _assert_equal(src, dst, table):
    a, b = src.read(table), dst.read(table)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_replicate_tracks_source_through_dml(spark, tmp_path):
    src = Warehouse(spark, str(tmp_path / "src"))
    dst = Warehouse(spark, str(tmp_path / "dst"))
    off = str(tmp_path / "offsets.json")

    src.merge_batch_incremental({"functions": _fns(spark, [(k, k) for k in range(300)])})
    assert replicate(src, dst, "functions", off), "initial snapshot applies"
    _assert_equal(src, dst, "functions")

    src.merge_batch_incremental(
        {"functions": _fns(spark, [(7, 700), (400, 4)])}, batch_seq=2
    )
    src.update_where("functions", [("uid", "=", "9")], {"size": 999})
    src.delete_where("functions", [("size", "between", (100, 110))])
    applied = replicate(src, dst, "functions", off)
    assert len(applied) == 3, "one batch per source version"
    _assert_equal(src, dst, "functions")
    assert dst.read("functions").filter(F.col("uid") == "7").collect()[0]["size"] == 700
    assert dst.read("functions").filter(F.col("size").between(100, 110)).count() == 0


def test_replay_after_lost_offset_is_zero_write(spark, tmp_path):
    src = Warehouse(spark, str(tmp_path / "src"))
    dst = Warehouse(spark, str(tmp_path / "dst"))
    off = str(tmp_path / "offsets.json")
    src.merge_batch_incremental({"functions": _fns(spark, [(k, k) for k in range(100)])})
    src.delete_where("functions", [("uid", "=", "5")])
    applied = replicate(src, dst, "functions", off)
    versions_before = dst.versions("functions")
    # crash before the offset write: rewind and re-drain
    _write_offset(off, "functions", applied[-2] if len(applied) > 1 else -1)
    replicate(src, dst, "functions", off)
    assert dst.versions("functions") == versions_before, (
        "re-applied batch must publish nothing (txn skip + no-match delete)"
    )
    _assert_equal(src, dst, "functions")


def test_multi_column_key_deletion_raises(spark, tmp_path):
    dst = Warehouse(spark, str(tmp_path / "dst"))
    ch = spark.createDataFrame(
        [("b1", "f1", "delete")],
        "binary_hash string, function_uid string, _change string",
    )
    with pytest.raises(ValueError, match="single-column"):
        apply_changes(dst, "contains", ch, 1)


def test_stream_changes_offsets_are_per_table(spark, tmp_path):
    src = Warehouse(spark, str(tmp_path / "src"))
    off = str(tmp_path / "offsets.json")
    src.merge_batch_incremental({"functions": _fns(spark, [(1, 1)])})
    batches = list(stream_changes(src, "functions", off))
    assert len(batches) == 1 and batches[0][1] is None  # initial snapshot
    # offset not advanced (no apply): the same batch streams again
    assert len(list(stream_changes(src, "functions", off))) == 1
    _write_offset(off, "functions", batches[0][2])
    assert list(stream_changes(src, "functions", off)) == []
