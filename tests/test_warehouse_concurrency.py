"""Optimistic concurrency on the manifest commit + the rebucket lever.

Two writers racing on one table used to both "win" a version number
(os.replace overwrites), silently losing one commit.  The commit loop
now publishes with an atomic create-if-absent and either REBASES
(disjoint touched buckets) or raises ConcurrentCommitError — these
tests drive REAL merge_batch_incremental calls interleaved
deterministically, not a mocked commit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import ConcurrentCommitError, Warehouse


class InterleavedWarehouse(Warehouse):
    """Test double: runs an injected action after this writer's merge
    work (base manifest read + staged data files) but BEFORE its
    manifest publish — the deterministic schedule of two racing
    writers (the injected action is 'the other writer wins the race')."""

    def __init__(self, spark, root):
        super().__init__(spark, root)
        self._inject = None

    def _commit_manifest(self, table, buckets=None, n_buckets=None, **kw):
        inj, self._inject = self._inject, None
        if inj is not None:
            inj()
        return super()._commit_manifest(table, buckets, n_buckets, **kw)


def _fns(spark, rows):
    return spark.createDataFrame(
        [(str(k), f"fn_{k}", "", v, "Internal") for k, v in rows],
        "uid string, name string, address string, size long, type string",
    )


def _bucket_of(spark, uid: str, nb: int = 64) -> int:
    return (
        spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(uid)), F.lit(nb)).cast("int").alias("b"))
        .collect()[0]["b"]
    )


def _two_keys_distinct_buckets(spark):
    ka = "1"
    ba = _bucket_of(spark, ka)
    for cand in range(2, 40):
        if _bucket_of(spark, str(cand)) != ba:
            return ka, str(cand)
    raise AssertionError("no distinct-bucket key pair found")


def test_disjoint_concurrent_commits_rebase_and_serialize(spark, tmp_path):
    """Writer A commits against base v0; writer B wins the race with a
    commit touching DIFFERENT buckets. A's publish detects the new head
    and rebases: both writers' rows survive, versions serialize."""
    root = str(tmp_path / "wh")
    a, b = InterleavedWarehouse(spark, root), Warehouse(spark, root)
    b.merge_batch_incremental({"functions": _fns(spark, [(k, k) for k in range(200)])})
    v0 = b.versions("functions")[-1]

    ka, kb = _two_keys_distinct_buckets(spark)
    a._inject = lambda: b.merge_batch_incremental(
        {"functions": _fns(spark, [(kb, 999)])}, batch_seq=2
    )
    a.merge_batch_incremental({"functions": _fns(spark, [(ka, 888)])}, batch_seq=3)

    vals = {r["uid"]: r["size"] for r in a.read("functions").collect()}
    assert vals[ka] == 888, "loser's commit was lost instead of rebased"
    assert vals[kb] == 999, "winner's commit was clobbered by the rebase"
    assert len(vals) == 200
    assert a.versions("functions") == [v0, v0 + 1, v0 + 2]  # serialized
    # the rebased manifest carries BOTH writers' buckets from the head,
    # not A's stale base view
    m = a._manifest("functions", v0 + 2)
    assert m["buckets"][str(_bucket_of(spark, kb))] == b._manifest(
        "functions", v0 + 1
    )["buckets"][str(_bucket_of(spark, kb))]


def test_overlapping_concurrent_commits_raise_and_orphans_vacuum(spark, tmp_path):
    """Writers touching the SAME bucket cannot rebase (the loser's merge
    was computed against stale content): the loser raises, its staged
    files are invisible orphans, and vacuum sweeps them."""
    root = str(tmp_path / "wh")
    a, b = InterleavedWarehouse(spark, root), Warehouse(spark, root)
    b.merge_batch_incremental({"functions": _fns(spark, [(k, k) for k in range(50)])})

    ka = "7"
    a._inject = lambda: b.merge_batch_incremental(
        {"functions": _fns(spark, [(ka, 111)])}, batch_seq=2
    )
    with pytest.raises(ConcurrentCommitError, match="rewrote buckets"):
        a.merge_batch_incremental({"functions": _fns(spark, [(ka, 222)])}, batch_seq=3)

    # the winner's value is live; the loser left no visible trace
    vals = {r["uid"]: r["size"] for r in b.read("functions").collect()}
    assert vals[ka] == 111 and len(vals) == 50
    # ...but its staged files are on disk as orphans until vacuum
    from pathlib import Path

    tdir = Path(root) / "functions"
    live = {
        f"_kb={kb}/{fn}"
        for kb, fs in b._live_bucket_files("functions").items()
        for fn in fs
    }
    reach = set()
    for v in b._manifest_versions("functions"):
        m = b._manifest("functions", v)
        reach |= {f"_kb={kb}/{fn}" for kb, fs in m["buckets"].items() for fn in fs}
    on_disk = {
        f"{p.parent.name}/{p.name}"
        for p in tdir.glob("_kb=*/*")
        if p.is_file() and not p.name.startswith((".", "_"))
    }
    assert on_disk - reach, "expected the loser's orphaned files on disk"
    b.vacuum(keep_last=0)
    on_disk2 = {
        f"{p.parent.name}/{p.name}"
        for p in tdir.glob("_kb=*/*")
        if p.is_file() and not p.name.startswith((".", "_"))
    }
    assert on_disk2 == live, "vacuum must sweep exactly the unreachable files"
    vals2 = {r["uid"]: r["size"] for r in b.read("functions").collect()}
    assert vals2 == vals


def test_whole_table_commit_conflict_raises(spark, tmp_path):
    """A whole-table commit (flat merge) racing any other commit cannot
    rebase — the loser raises instead of silently overwriting."""
    root = str(tmp_path / "wh")
    a, b = InterleavedWarehouse(spark, root), Warehouse(spark, root)
    b.merge_batch({"functions": _fns(spark, [(k, k) for k in range(20)])})

    a._inject = lambda: b.merge_batch(
        {"functions": _fns(spark, [(3, 333)])}, batch_seq=2
    )
    with pytest.raises(ConcurrentCommitError, match="whole table"):
        a.merge_batch({"functions": _fns(spark, [(4, 444)])}, batch_seq=3)
    vals = {r["uid"]: r["size"] for r in b.read("functions").collect()}
    assert vals["3"] == 333 and "4" not in {k for k, v in vals.items() if v == 444}


def test_rebucket_preserves_values_history_and_lww(spark, tmp_path):
    """rebucket(table, new_B): values identical, old versions readable
    across the re-layout, later incremental commits hash at the new
    modulus (LWW still holds — the failure a silent modulus change
    would cause is a duplicate key)."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k * 10) for k in range(300)])}
    )
    v_old = wh.versions("functions")[-1]
    before = {r["uid"]: r["size"] for r in wh.read("functions").collect()}

    v_new = wh.rebucket("functions", 16)
    assert wh._manifest("functions", v_new)["n_buckets"] == 16
    after = {r["uid"]: r["size"] for r in wh.read("functions").collect()}
    assert after == before
    # time travel crosses the rebucket (old manifest pins old layout)
    old = {r["uid"]: r["size"] for r in wh.read("functions", version=v_old).collect()}
    assert old == before
    # incremental commits now hash at the new modulus; LWW intact
    wh.merge_batch_incremental({"functions": _fns(spark, [(7, 777)])}, batch_seq=2)
    rows = wh.read("functions").filter(F.col("uid") == "7").collect()
    assert len(rows) == 1 and rows[0]["size"] == 777
    assert wh.read("functions").count() == 300
    # rollback to the pre-rebucket version is pure metadata and restores
    # the old modulus with it
    wh.rollback("functions", v_old)
    mvs = wh._manifest_versions("functions")
    assert wh._manifest("functions", mvs[-1])["n_buckets"] == 64
    assert {r["uid"]: r["size"] for r in wh.read("functions").collect()} == before
    wh.merge_batch_incremental({"functions": _fns(spark, [(9, 909)])}, batch_seq=3)
    assert wh.read("functions").filter(F.col("uid") == "9").collect()[0]["size"] == 909
    # CLI surface
    from binaryx_graph_spark.cli import main

    assert main(["--warehouse", root, "db", "rebucket", "functions", "32"]) == 0
    mvs = wh._manifest_versions("functions")
    assert wh._manifest("functions", mvs[-1])["n_buckets"] == 32


def test_rebucket_errors_and_mismatch_message(spark, tmp_path):
    """The n_buckets-mismatch guard points at rebucket; rebucket rejects
    flat tables and no-ops on an equal modulus."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch({"functions": _fns(spark, [(1, 1)])})
    with pytest.raises(ValueError, match="flat"):
        wh.rebucket("functions", 8)
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    wh2.merge_batch_incremental({"functions": _fns(spark, [(1, 1)])})
    with pytest.raises(ValueError, match="rebucket"):
        wh2.merge_batch_incremental({"functions": _fns(spark, [(2, 2)])}, n_buckets=8)
    v = wh2.versions("functions")[-1]
    assert wh2.rebucket("functions", 64) == v  # same modulus: no-op


def test_adoption_validates_pinned_modulus(spark, tmp_path):
    """Adopting a pre-manifest bucketed directory validates the pinned
    count: out-of-range bucket ids and wrong-modulus layouts raise
    instead of silently breaking LWW (r8 ADVICE)."""
    import shutil

    # build a REAL n_buckets=8 layout, then strip its manifests to
    # simulate a legacy directory
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(100)])}, n_buckets=8
    )
    shutil.rmtree(tmp_path / "wh" / "_manifests")

    # adopting without re-passing n_buckets=8 pins the default 64 —
    # the one-bucket re-hash probe catches the wrong modulus
    with pytest.raises(ValueError, match="different modulus|pass the layout's"):
        wh.merge_batch_incremental({"functions": _fns(spark, [(5, 555)])}, batch_seq=2)

    # re-passing the true modulus adopts cleanly and LWW works
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(5, 555)])}, batch_seq=2, n_buckets=8
    )
    rows = wh.read("functions").filter(F.col("uid") == "5").collect()
    assert len(rows) == 1 and rows[0]["size"] == 555

    # out-of-range bucket ids (a 64-bucket layout adopted as 8) raise
    # on the cheap id check before any probe
    root2 = str(tmp_path / "wh2")
    wh2 = Warehouse(spark, root2)
    wh2.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(100)])}, n_buckets=64
    )
    shutil.rmtree(tmp_path / "wh2" / "_manifests")
    with pytest.raises(ValueError, match="bucket ids up to"):
        wh2.merge_batch_incremental(
            {"functions": _fns(spark, [(5, 5)])}, batch_seq=2, n_buckets=8
        )


def test_recommended_buckets_and_maybe_rebucket(spark, tmp_path):
    """The B ∝ table-size policy: recommendation is a stable power of
    two from live manifest bytes (metadata only); maybe_rebucket fires
    only past the 4x hysteresis, never shrinks, and preserves values."""
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(500)])}
    )
    # generous target -> small recommendation -> no rebucket (never shrinks)
    assert wh.recommended_buckets("functions", target_bucket_bytes=1 << 40) == 1
    assert wh.maybe_rebucket("functions", target_bucket_bytes=1 << 40) is None
    mvs = wh._manifest_versions("functions")
    assert wh._manifest("functions", mvs[-1])["n_buckets"] == 64

    # target sized so the CURRENT live bytes want ~300 buckets -> the
    # table has "outgrown" 64 buckets 4x (at gate scale bytes track
    # file overhead, so targets derive from measured bytes, exactly as
    # a deployment would pick target_bucket_bytes from its file sizes)
    live_bytes = wh.history("functions")[-1]["bytes"]
    target = max(1, live_bytes // 300)
    rec = wh.recommended_buckets("functions", target_bucket_bytes=target)
    assert rec >= 4 * 64 and (rec & (rec - 1)) == 0  # power of two
    before = {r["uid"]: r["size"] for r in wh.read("functions").collect()}
    v = wh.maybe_rebucket("functions", target_bucket_bytes=target)
    assert v is not None
    assert wh._manifest("functions", v)["n_buckets"] == rec
    assert {r["uid"]: r["size"] for r in wh.read("functions").collect()} == before
    # hysteresis: a recommendation derived from the CURRENT bytes sits
    # near the pinned count -> no re-layout fires
    live2 = wh.history("functions")[-1]["bytes"]
    assert wh.maybe_rebucket("functions", target_bucket_bytes=max(1, live2 // 300)) is None


def test_vacuum_sweeps_abandoned_staging_with_ttl(spark, tmp_path):
    """A crashed writer abandons a per-writer staging dir; vacuum sweeps
    it once past the TTL, and the TTL protects an in-flight writer's
    fresh staging."""
    import os

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    wh.merge_batch_incremental({"functions": _fns(spark, [(1, 1)])})
    from pathlib import Path

    crashed = Path(root) / "_functions_inc_staging_deadbeef0000"
    crashed.mkdir()
    (crashed / "part-stale").write_text("x")
    old = 1_000_000_000  # well past any TTL
    os.utime(crashed, (old, old))
    fresh = Path(root) / "_functions_inc_staging_aaaaaaaa0000"
    fresh.mkdir()
    wh.vacuum(keep_last=2)  # default 24h TTL
    assert not crashed.exists(), "aged staging must be swept"
    assert fresh.exists(), "fresh staging (a live writer) must survive"
    wh.vacuum(keep_last=2, staging_ttl_hours=0)
    assert not fresh.exists(), "ttl=0 sweeps everything (quiesced warehouse)"

def _fragment_bucket(spark, wh, root, kb, n_files=2):
    """Re-layout one bucket's content into n_files files AS a manifest
    commit (incremental merges rewrite whole buckets, so fragmentation
    only arises from multi-file writes at real scale — recreate it
    through the protocol, not by mutating live files)."""
    from pathlib import Path

    mvs = wh._manifest_versions("functions")
    m = wh._manifest("functions", mvs[-1])
    files = m["buckets"][kb]
    tdir = Path(root) / "functions" / f"_kb={kb}"
    stage = Path(root) / f"_frag_stage_{kb}"
    spark.read.parquet(*[str(tdir / f) for f in files]).repartition(
        n_files
    ).write.mode("overwrite").parquet(str(stage))
    names = []
    for f in sorted(stage.glob("part-*")):
        f.rename(tdir / f.name)
        names.append(f.name)
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    newb = dict(m["buckets"])
    newb[kb] = names
    wh._commit_manifest(
        "functions", newb, m["n_buckets"], base_version=m["version"], touched={kb}
    )
    return len(names)


def test_compaction_rebases_over_concurrent_ingest(spark, tmp_path):
    """The verdict's 'normal case at 100 TB': maintenance compaction
    racing an ingest commit.  Compaction passes its compacted buckets
    as the touched set, so when the concurrent ingest touched OTHER
    buckets the compaction rebases (both commits survive); when the
    ingest rewrote one of the buckets being compacted, compaction
    raises instead of resurrecting the pre-ingest files."""
    root = str(tmp_path / "wh")
    a, b = InterleavedWarehouse(spark, root), Warehouse(spark, root)
    b.merge_batch_incremental(
        {"functions": _fns(spark, [(k, k) for k in range(300)])}
    )
    live = b._live_bucket_files("functions")
    # pick a bucket with >=2 rows to fragment, and a different bucket
    # for the concurrent ingest
    counts = {
        kb: spark.read.parquet(
            *[f"{root}/functions/_kb={kb}/{fn}" for fn in fs]
        ).count()
        for kb, fs in list(live.items())[:8]
        if fs
    }
    kb_frag = next(kb for kb, c in counts.items() if c >= 2)
    assert _fragment_bucket(spark, b, root, kb_frag) >= 2

    key_other = next(
        f"Z_{j}"
        for j in range(400)
        if str(_bucket_of(spark, f"Z_{j}")) != kb_frag
    )
    a._inject = lambda: b.merge_batch_incremental(
        {"functions": _fns(spark, [(key_other, 12345)])}, batch_seq=9
    )
    res = a.optimize(target_bytes=1 << 30)  # compacts exactly the fragmented bucket
    assert res["functions"][1] < res["functions"][0]
    vals = {r["uid"]: r["size"] for r in a.read("functions").collect()}
    assert vals[key_other] == 12345, "concurrent ingest lost under compaction rebase"
    assert vals["150"] == 150, "compaction changed values"
    assert len(vals) == 301
    assert all(len(fs) <= 1 for fs in a._live_bucket_files("functions").values())

    # overlapping race: the ingest rewrites the bucket being compacted
    # -> compaction must raise, and the ingest's value stays live
    counts2 = {
        kb: spark.read.parquet(
            *[f"{root}/functions/_kb={kb}/{fn}" for fn in fs]
        ).count()
        for kb, fs in list(a._live_bucket_files("functions").items())[:8]
        if fs
    }
    kb2 = next(kb for kb, c in counts2.items() if c >= 2)
    _fragment_bucket(spark, b, root, kb2)
    key_same = next(
        str(j) for j in range(300) if str(_bucket_of(spark, str(j))) == kb2
    )
    a._inject = lambda: b.merge_batch_incremental(
        {"functions": _fns(spark, [(key_same, 777)])}, batch_seq=13
    )
    with pytest.raises(ConcurrentCommitError):
        a.optimize(target_bytes=1 << 30)
    assert {r["uid"]: r["size"] for r in b.read("functions").collect()}[key_same] == 777


def test_manifest_byte_maps_complete_and_metadata_only(spark, tmp_path):
    """Every commit records per-file sizes in its manifest; history()
    and recommended_buckets() then answer from metadata alone, matching
    stat reality exactly (the object-store LIST-storm avoidance)."""
    from pathlib import Path

    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root)
    # exercise every commit kind: flat merge, conversion, incremental,
    # rebucket, compaction, metadata rollback
    wh.merge_batch({"functions": _fns(spark, [(k, k) for k in range(50)])})
    wh.merge_batch_incremental({"functions": _fns(spark, [(5, 55)])}, batch_seq=2)
    wh.merge_batch_incremental({"functions": _fns(spark, [(7, 77)])}, batch_seq=3)
    wh.rebucket("functions", 16)
    wh.rollback("functions", wh.versions("functions")[-2])

    for v in wh._manifest_versions("functions"):
        m = wh._manifest("functions", v)
        bm = m.get("bytes")
        assert bm is not None, f"v{v} has no byte map"
        if "buckets" in m:
            rels = {
                (f"{b}/{fn}", Path(root) / "functions" / f"_kb={b}" / fn)
                for b, fs in m["buckets"].items()
                for fn in fs
            }
        else:
            rels = {(fn, Path(root) / "functions" / fn) for fn in m["files"]}
        assert set(bm) == {r for r, _ in rels}, f"v{v} byte map incomplete"
        for r, p in rels:
            assert bm[r] == p.stat().st_size, f"v{v} {r} size drifted"

    # history() totals equal a stat-computed ground truth
    for row in wh.history("functions"):
        if row["kind"] != "manifest":
            continue
        m = wh._manifest("functions", row["version"])
        assert row["bytes"] == sum(m["bytes"].values())
    # recommended_buckets runs off the same map (smoke: no exception,
    # sane value)
    assert wh.recommended_buckets("functions") >= 1


def test_streaming_maintenance_auto_rebucket(spark, tmp_path):
    """The streaming maintenance cadence re-layouts a merge table once
    it outgrows its pinned bucket count (auto_rebucket_bytes), and the
    stream keeps committing at the new modulus with exact counts."""
    import json as _json

    from binaryx_graph_spark.streaming.ingest_stream import stream_analysis_json
    from tools.endurance_stream import synth_doc

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i in range(6):
        (in_dir / f"d{i}.json").write_text(_json.dumps(synth_doc(i)))
    root = str(tmp_path / "wh")
    q = stream_analysis_json(
        spark, str(in_dir), root,
        max_files_per_trigger=1, incremental=True,
        maintenance_every=2, vacuum_keep_last=1,
        merge_tables=("functions",),
        auto_rebucket_bytes=16,  # per-bucket target far under live bytes
    )
    q.awaitTermination()
    wh = Warehouse(spark, root)
    mvs = wh._manifest_versions("functions")
    nb = wh._manifest("functions", mvs[-1])["n_buckets"]
    assert nb > 64, f"auto-rebucket never fired: n_buckets={nb}"
    assert wh.read("functions").count() == 6 * 5 + 1  # 5 fns/doc + shared import fn
    # commits continue at the new modulus with LWW intact
    wh.merge_batch_incremental(
        {"functions": _fns(spark, [("fn_post", 9)])}, batch_seq=99
    )
    assert wh.read("functions").count() == 6 * 5 + 2
