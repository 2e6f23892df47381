"""Exactly-once idempotent commits: txn=(app, version) in the manifest
(Delta's txnAppId/txnVersion).  A replayed (app, version) — foreachBatch
retry, scheduler re-run, reprocess after checkpoint loss — must publish
ZERO new versions and write ZERO files, including when the replay loses
a commit race to its own twin mid-publish."""

from __future__ import annotations

from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import Warehouse

SCHEMA = "uid string, name string, address string, size long, type string"


def _fns(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", v, "Internal") for k, v in rows], SCHEMA
    )


def _state(wh):
    return (
        wh.versions("functions"),
        sorted(tuple(r) for r in wh.read("functions").collect()),
    )


def test_replay_skipped_zero_versions(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    out1 = wh.merge_batch_incremental(
        {"functions": _fns(spark, [(1, 1), (2, 2)])}, txn=("appA", 0)
    )
    assert "functions" in out1
    vs1, rows1 = _state(wh)
    # exact replay: same app, same version — skipped, no work reported
    out2 = wh.merge_batch_incremental(
        {"functions": _fns(spark, [(1, 1), (2, 2)])}, txn=("appA", 0)
    )
    assert "functions" not in out2
    assert _state(wh) == (vs1, rows1)
    # lower version (late straggler) — also skipped
    out3 = wh.merge_batch_incremental(
        {"functions": _fns(spark, [(9, 9)])}, batch_seq=2, txn=("appA", -1)
    )
    assert "functions" not in out3 and _state(wh) == (vs1, rows1)


def test_higher_version_and_other_app_commit(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, [(1, 1)])}, txn=("appA", 0))
    out = wh.merge_batch_incremental(
        {"functions": _fns(spark, [(2, 2)])}, batch_seq=2, txn=("appA", 1)
    )
    assert "functions" in out
    out = wh.merge_batch_incremental(
        {"functions": _fns(spark, [(3, 3)])}, batch_seq=3, txn=("appB", 0)
    )
    assert "functions" in out
    assert wh.last_txn_version("functions", "appA") == 1
    assert wh.last_txn_version("functions", "appB") == 0
    assert wh.last_txn_version("functions", "ghost") is None
    assert wh.read("functions").count() == 3


def test_txn_map_survives_untagged_commits_and_rollback(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch_incremental({"functions": _fns(spark, [(1, 1)])}, txn=("appA", 7))
    v_tagged = wh.versions("functions")[-1]
    wh.merge_batch_incremental({"functions": _fns(spark, [(2, 2)])}, batch_seq=2)
    wh.rollback("functions", v_tagged)
    assert wh.last_txn_version("functions", "appA") == 7
    # an applied batch stays applied after the rollback
    out = wh.merge_batch_incremental(
        {"functions": _fns(spark, [(1, 999)])}, batch_seq=3, txn=("appA", 7)
    )
    assert "functions" not in out
    assert [r["size"] for r in wh.read("functions").collect()] == [1]


def test_flat_merge_replay_skipped(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.merge_batch({"functions": _fns(spark, [(1, 1)])}, txn=("appA", 0))
    vs1, rows1 = _state(wh)
    wh.merge_batch({"functions": _fns(spark, [(1, 777)])}, batch_seq=2, txn=("appA", 0))
    assert _state(wh) == (vs1, rows1)


def test_lost_ack_race_skips_at_publish(spark, tmp_path):
    """Twin writers with one (app, version): the pre-check passes for
    both, the loser must still skip AT THE MANIFEST (the in-loop
    re-check), leaving exactly one committed version."""
    from tests.test_warehouse_concurrency import InterleavedWarehouse

    root = str(tmp_path / "wh")
    wa = InterleavedWarehouse(spark, root)
    wb = Warehouse(spark, root)
    wa.merge_batch_incremental({"functions": _fns(spark, [(1, 1)])}, txn=("app", 0))

    def twin_wins():
        wb.merge_batch_incremental(
            {"functions": _fns(spark, [(5, 5)])}, batch_seq=2, txn=("app", 1)
        )

    wa._inject = twin_wins
    out = wa.merge_batch_incremental(
        {"functions": _fns(spark, [(5, 5)])}, batch_seq=2, txn=("app", 1)
    )
    assert "functions" not in out, "the twin's loser must skip, not double-commit"
    assert wh_rows(wa) == {("1", 1), ("5", 5)}
    assert wa.last_txn_version("functions", "app") == 1


def wh_rows(wh):
    return {(r["uid"], r["size"]) for r in wh.read("functions").collect()}


def test_streaming_rerun_after_checkpoint_loss_publishes_nothing(
    spark, tmp_path_factory
):
    from binaryx_graph_spark.streaming.ingest_stream import stream_analysis_json

    from .fixtures import write_fixture

    d = write_fixture(tmp_path_factory.mktemp("txn_stream_in"))
    root = str(tmp_path_factory.mktemp("txn_stream_wh") / "wh")
    q = stream_analysis_json(
        spark, d, root, incremental=True, txn_app="ingest_stream_1"
    )
    q.awaitTermination()
    wh = Warehouse(spark, root)
    before = {t: wh.versions(t) for t in ("functions", "calls", "binaries")}
    # fresh query, fresh checkpoint (the default temp one), same input:
    # the post-checkpoint-loss reprocess. Every epoch replays and every
    # commit must be skipped at the manifest — version lists unchanged.
    q2 = stream_analysis_json(
        spark, d, root, incremental=True, txn_app="ingest_stream_1"
    )
    q2.awaitTermination()
    after = {t: wh.versions(t) for t in ("functions", "calls", "binaries")}
    assert before == after
