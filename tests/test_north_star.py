"""North-star operator behaviors not covered by the SQL oracles:
LSH recall vs exact baseline, multimodal feature/frame plumbing,
streaming graph ingest end-to-end."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    media_from_documents,
    sample_frames,
)
from binaryx_graph_spark.operators.similarity import cosine_topk, cosine_topk_lsh
from binaryx_graph_spark.sources.warehouse import Warehouse
from binaryx_graph_spark.streaming.ingest_stream import stream_analysis_json

from .fixtures import write_fixture

SF = "/root/testdata/sf0.001"


def test_lsh_candidates_subset_of_brute_force_order(spark):
    """LSH top-k must be a subset of the full ranking restricted to the
    bucket — and nonempty on this data."""
    emb = load_table(spark, SF, "embeddings")
    n = emb.count()
    exact = {r["vec_id"]: r["cos_sim"] for r in cosine_topk(emb, 7, k=n).collect()}
    approx = cosine_topk_lsh(emb, 7, k=10, bits=4).collect()
    assert approx, "bucket should contain neighbors at 4 bits"
    for r in approx:
        assert r["vec_id"] in exact
        assert abs(exact[r["vec_id"]] - r["cos_sim"]) < 1e-12


def test_multimodal_features_shape(spark):
    docs = load_table(spark, SF, "documents").limit(20)
    media = media_from_documents(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["features"])


def test_multimodal_decode_deterministic(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    media = media_from_documents(docs)
    a = sorted(map(tuple, decode_media(media).collect()))
    b = sorted(map(tuple, decode_media(media).collect()))
    assert a == b
    for row in a:
        _id, _mime, w, h, c, n = row
        assert 1 <= w <= 2048 and 1 <= h <= 2048 and 1 <= c <= 4 and n > 0


def test_frame_sampling_covers_payload(spark):
    docs = load_table(spark, SF, "documents").limit(30)
    media = media_from_documents(docs)
    frames = sample_frames(media, n_frames=4)
    per_media = frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per_media and all(r["n"] == 4 for r in per_media)


def test_streaming_graph_ingest_matches_batch(spark, tmp_path_factory):
    d = write_fixture(tmp_path_factory.mktemp("stream_in"))
    root = str(tmp_path_factory.mktemp("stream_wh") / "wh")
    q = stream_analysis_json(spark, d, root)
    q.awaitTermination()
    wh = Warehouse(spark, root)
    assert wh.read("functions").count() == 6
    assert wh.read("calls").count() == 5
    assert wh.read("binaries").count() == 2


def test_streaming_graph_ingest_rerun_is_idempotent(spark, tmp_path_factory):
    """Exactly-once claim: replaying the same input through the streaming
    ingest leaves the warehouse unchanged (idempotent merge)."""
    d = write_fixture(tmp_path_factory.mktemp("stream_in2"))
    root = str(tmp_path_factory.mktemp("stream_wh2") / "wh")
    q1 = stream_analysis_json(spark, d, root)
    q1.awaitTermination()
    wh = Warehouse(spark, root)
    before = {t: wh.read(t).count() for t in ("functions", "calls", "binaries", "strings")}
    q2 = stream_analysis_json(spark, d, root)  # fresh query, same input
    q2.awaitTermination()
    after = {t: wh.read(t).count() for t in ("functions", "calls", "binaries", "strings")}
    assert before == after


def test_streaming_ingest_then_compaction_composes(spark, tmp_path_factory):
    """The 100 TB maintenance sequence end-to-end: per-micro-batch
    streaming MERGE (maxFilesPerTrigger=1 → one commit per input file),
    then Warehouse.optimize — values must be untouched and the file
    count must not grow.  (warehouse_compaction_certified pins the
    value/layout contract at data scale; this pins the STREAMING
    composition specifically.)"""
    from pathlib import Path

    d = write_fixture(tmp_path_factory.mktemp("stream_in3"))
    root = str(tmp_path_factory.mktemp("stream_wh3") / "wh")
    q = stream_analysis_json(spark, d, root, max_files_per_trigger=1)
    q.awaitTermination()
    wh = Warehouse(spark, root)
    watched = ("functions", "calls", "binaries", "strings")
    before_rows = {t: sorted(map(tuple, wh.read(t).collect())) for t in watched}
    before_files = {
        t: len([f for f in (Path(root) / t).glob("part-*") if f.is_file()])
        for t in watched
    }
    wh.optimize(target_bytes=128 * 1024 * 1024)
    for t in watched:
        after_files = len([f for f in (Path(root) / t).glob("part-*") if f.is_file()])
        assert after_files <= before_files[t]
        assert sorted(map(tuple, wh.read(t).collect())) == before_rows[t]


def test_streaming_incremental_ingest_equals_full_and_compacts_per_bucket(
    spark, tmp_path_factory
):
    """The full 100 TB streaming topology: per-micro-batch INCREMENTAL
    merge (bucket-granular commits), then bucket-aware compaction.
    Incremental streaming must equal the full-rewrite streaming result
    exactly; optimize() must preserve the bucketed layout (compact
    inside _kb=* dirs, never flatten them) with values untouched."""
    from pathlib import Path

    d = write_fixture(tmp_path_factory.mktemp("stream_in4"))
    roots = {}
    for label, inc in (("full", False), ("inc", True)):
        root = str(tmp_path_factory.mktemp(f"stream_wh4_{label}") / "wh")
        q = stream_analysis_json(spark, d, root, max_files_per_trigger=1, incremental=inc)
        q.awaitTermination()
        roots[label] = root
    watched = ("functions", "calls", "binaries", "strings")
    wf, wi = Warehouse(spark, roots["full"]), Warehouse(spark, roots["inc"])
    for t in watched:
        assert sorted(map(tuple, wf.read(t).collect())) == sorted(
            map(tuple, wi.read(t).collect())
        ), t
        assert any((Path(roots["inc"]) / t).glob("_kb=*")), f"{t} not bucketed"
    before = {t: sorted(map(tuple, wi.read(t).collect())) for t in watched}
    wi.optimize(target_bytes=128 * 1024 * 1024)
    for t in watched:
        tdir = Path(roots["inc"]) / t
        assert any(tdir.glob("_kb=*")), f"optimize flattened {t}"
        # LIVE file set = the manifest's, not the directory's: older
        # versions' files stay on disk for time travel until vacuumed
        for b, files in wi._live_bucket_files(t).items():
            assert len(files) <= 1, f"{t} _kb={b} not compacted: {files}"
            for fn in files:
                assert (tdir / f"_kb={b}" / fn).is_file()
        assert sorted(map(tuple, wi.read(t).collect())) == before[t], t


def test_streaming_incremental_long_stream_stays_bounded(
    spark, tmp_path_factory
):
    """The LONG-stream composition (r7 verdict #3, gate-scale twin of
    tools/endurance_stream.py): 15 one-file micro-batch commits in 3
    waves through ONE persistent checkpoint, with the full maintenance
    cadence (optimize + vacuum) between waves.  Pins: (a) incremental
    streaming equals the full-rewrite result across restarts, (b) the
    LIVE file count is bounded by the bucket count after compaction —
    not by stream length, (c) the on-disk file count is bounded by
    live + retained time-travel versions after vacuum — commits never
    accumulate unbounded physical state."""
    import json as _json
    from pathlib import Path

    from tools.endurance_stream import synth_doc

    watched = ("binaries", "functions", "strings", "calls")
    roots, ckpts, in_dirs = {}, {}, {}
    for label in ("full", "inc"):
        base = tmp_path_factory.mktemp(f"longstream_{label}")
        roots[label] = str(base / "wh")
        ckpts[label] = str(base / "ckpt")
        d = base / "in"
        d.mkdir()
        in_dirs[label] = str(d)

    n = 0
    for wave in range(3):
        for _ in range(5):
            doc = synth_doc(n)
            for label in ("full", "inc"):
                (Path(in_dirs[label]) / f"doc_{n:05d}.json").write_text(
                    _json.dumps(doc)
                )
            n += 1
        for label, inc in (("full", False), ("inc", True)):
            q = stream_analysis_json(
                spark, in_dirs[label], roots[label],
                max_files_per_trigger=1, incremental=inc,
                checkpoint_location=ckpts[label],
                merge_tables=watched,
            )
            q.awaitTermination()
        wi = Warehouse(spark, roots["inc"])
        wi.optimize(target_bytes=128 * 1024 * 1024)
        wi.vacuum(keep_last=2)

    wf, wi = Warehouse(spark, roots["full"]), Warehouse(spark, roots["inc"])
    for t in watched:
        assert sorted(map(tuple, wf.read(t).collect())) == sorted(
            map(tuple, wi.read(t).collect())
        ), t
        live = wi._live_bucket_files(t)
        n_live = sum(len(v) for v in live.values())
        # bounded by buckets (64), not by the 15 commits x files/commit
        assert n_live <= wi.N_KEY_BUCKETS, f"{t}: {n_live} live files"
        assert all(len(v) <= 1 for v in live.values()), f"{t} bucket not compacted"
        # disk = live + what the retained manifests still reference
        reach = set()
        for v in wi.versions(t):
            if v in wi._manifest_versions(t):
                m = wi._manifest(t, v)
                reach |= {
                    f"_kb={b}/{fn}" for b, fs in m["buckets"].items() for fn in fs
                }
        on_disk = {
            f"{p.parent.name}/{p.name}"
            for p in (Path(roots["inc"]) / t).glob("_kb=*/*")
            if p.is_file() and not p.name.startswith((".", "_"))
        }
        assert on_disk == reach, f"{t}: {len(on_disk - reach)} unreachable files"


def test_multimodal_resize_shapes(spark):
    from binaryx_graph_spark.operators.multimodal import resize_media

    docs = load_table(spark, SF, "documents").limit(10)
    media = media_from_documents(docs)
    out = resize_media(media, width=32, height=16).collect()
    assert len(out) == 10
    for r in out:
        assert r["n_bytes_out"] == 32 * 16 * 3
        assert len(bytes(r["resized"])) == 32 * 16 * 3


def test_ivf_kmeans_recall_vs_brute_force(spark):
    """The k-means IVF probe must rank the true neighbors well: with 8
    centroids / 2 probes over the sf0.001 corpus, the probed top-10 must
    contain at least half of the exact brute-force top-10, and its top
    hit must be the true nearest neighbor's cosine or better within the
    probed partition (sanity: IVF returns real similarities, not noise)."""
    from binaryx_graph_spark.operators.similarity import cosine_topk_ivf

    emb = load_table(spark, SF, "embeddings")
    exact = [r["vec_id"] for r in cosine_topk(emb, 7, k=10).collect()]
    ivf_rows = cosine_topk_ivf(emb, 7, k=10, n_centroids=8, n_probe=2).collect()
    ivf = [r["vec_id"] for r in ivf_rows]
    overlap = len(set(exact) & set(ivf))
    assert overlap >= 5, f"IVF recall too low: {overlap}/10 ({ivf} vs {exact})"
    # scores must be genuine cosines (bounded, sorted descending)
    sims = [r["cos_sim"] for r in ivf_rows]
    assert sims == sorted(sims, reverse=True) and all(-1.0 <= s <= 1.0 for s in sims)


def test_semantic_near_dup_subset_of_brute_force(spark):
    """Cluster-scoped semantic dedup returns exactly the brute-force
    cosine pairs ≥ t whose endpoints share a k-means cluster: every
    emitted pair must appear in the all-pairs set with the identical
    score, and every all-pairs near-dup CO-CLUSTERED pair must be
    emitted (no false positives, no within-cluster misses)."""
    from binaryx_graph_spark.operators.similarity import (
        cosine,
        ivf_assign,
        kmeans_codebook,
        semantic_near_dup,
    )

    emb = load_table(spark, SF, "embeddings")
    t = 0.3
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in semantic_near_dup(emb, threshold=t, n_centroids=8, kmeans_iters=2).collect()
    }
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    brute = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= t)
        .collect()
    }
    cb = kmeans_codebook(emb, n_centroids=8, iters=2)
    cluster = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(emb, cb).collect()}
    expected = {p: s for p, s in brute.items() if cluster[p[0]] == cluster[p[1]]}
    assert got == expected and len(got) > 0


def test_kmeans_codebook_deterministic_and_moves(spark):
    """Two runs produce identical centroids (bit-for-bit), and the
    trained codebook differs from the raw seeds (the iterations really
    move the centroids)."""
    from binaryx_graph_spark.operators.similarity import kmeans_codebook

    emb = load_table(spark, SF, "embeddings")
    cb1 = kmeans_codebook(emb, n_centroids=8, iters=2)
    cb2 = kmeans_codebook(emb, n_centroids=8, iters=2)
    assert cb1 == cb2  # exact equality of doubles — determinism
    seeds = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in emb.orderBy("vec_id").limit(8).collect()}
    moved = sum(1 for cid in cb1 if cb1[cid] != seeds[cid])
    assert moved >= 6  # nearly all centroids moved off their seed


def test_connected_components_both_strategies_equal(spark):
    """The driver union-find fast path and the distributed label
    propagation must produce the identical (doc_id, cluster_id) set."""
    from binaryx_graph_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (30, 31), (5, 3)],
        "doc_a long, doc_b long",
    )
    local = sorted(map(tuple, connected_components(pairs).collect()))
    dist = sorted(map(tuple, connected_components(pairs, local_max_edges=0).collect()))
    assert local == dist
    assert local == [
        (1, 1), (2, 1), (3, 1), (5, 1), (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (30, 30), (31, 30),
    ]


def test_multiprobe_lsh_recall_dominates_single(spark):
    """Multi-probe candidates are a superset of single-probe's bucket, so
    overlap with the exact top-10 can only improve."""
    from binaryx_graph_spark.operators.similarity import cosine_topk_lsh_multiprobe

    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"] for r in cosine_topk(emb, 7, k=10).collect()}
    single = {r["vec_id"] for r in cosine_topk_lsh(emb, 7, k=10, bits=8).collect()}
    multi = {r["vec_id"] for r in cosine_topk_lsh_multiprobe(emb, 7, k=10, bits=8).collect()}
    assert len(multi & exact) >= len(single & exact)
    assert single <= multi | single  # sanity: single bucket ⊂ probe set


def test_pq_recall_vs_brute_force(spark):
    """PQ (4×8) asymmetric top-10 must overlap the exact brute-force
    top-10 — quantization moves the ranking but must keep real
    neighbors in front of random vectors — and scores must be bounded
    descending dots."""
    from binaryx_graph_spark.operators.similarity import cosine_topk_pq

    emb = load_table(spark, SF, "embeddings")
    exact = [r["vec_id"] for r in cosine_topk(emb, 7, k=10).collect()]
    pq_rows = cosine_topk_pq(emb, 7, k=10, m=4, k_sub=8).collect()
    pq = [r["vec_id"] for r in pq_rows]
    overlap = len(set(exact) & set(pq))
    assert overlap >= 3, f"PQ recall too low: {overlap}/10 ({pq} vs {exact})"
    scores = [r["approx_dot"] for r in pq_rows]
    assert scores == sorted(scores, reverse=True)


def test_bellman_ford_unit_weights_equal_bfs_depth(spark):
    """With every edge weight = 1, bounded Bellman-Ford distance must
    equal the BFS min-hop depth for every reached node (and the seed at
    distance 0) — two independent traversal engines agreeing."""
    from binaryx_graph_spark.operators.graphalgo import bellman_ford
    from binaryx_graph_spark.operators.traverse import reachable
    from binaryx_graph_spark.plans.graph_project import as_call_tables, derived_edges

    edges = derived_edges(spark, SF)
    ew = edges.withColumn("w", F.lit(1))
    seeds = spark.createDataFrame([(35,)], "v long")
    bf = {
        r["v"]: r["dist"]
        for r in bellman_ford(ew, seeds, iters=4).collect()
    }
    calls, _ = as_call_tables(edges)
    bfs = {
        int(r["uid"]): r["depth"]
        for r in reachable(
            calls, spark.createDataFrame([("35",)], "uid string"), direction="out", max_depth=4
        ).collect()
    }
    assert bf.pop(35, None) == 0  # seed
    # BFS omits the seed row unless re-reached; compare on the common contract
    bfs.pop(35, None)
    bf.pop(None, None)
    assert bf == bfs and len(bfs) > 0
