"""Warehouse-backed model store: trained artifacts as `_models` rows
with the full manifest story (LWW commit, time travel, staleness by
content key) — and the IVF codebook actually reusing it across
sessions (the /tmp JSON lane is gone)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.operators import similarity as sim
from binaryx_graph_spark.sources.model_store import ModelStore


def _emb(spark, n=64, dim=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.col("id") * (i + 1) % 7 - 3).cast("float")
                for i in range(dim)
            ]
        ).alias("embedding"),
    )


def test_put_get_roundtrip_and_staleness(spark, tmp_path):
    ms = ModelStore(spark, str(tmp_path / "models"))
    ms.put("m1", {"0": [1.0, 2.0]}, kind="kmeans_codebook", content_key="v1")
    assert ms.get("m1", content_key="v1") == {"0": [1.0, 2.0]}
    # stale content key (training code changed) → miss, not wrong data
    assert ms.get("m1", content_key="v2") is None
    assert ms.get("nope", content_key="v1") is None
    # LWW overwrite is a manifest commit: the old version time-travels
    ms.put("m1", {"0": [9.0]}, kind="kmeans_codebook", content_key="v2")
    assert ms.get("m1", content_key="v2") == {"0": [9.0]}
    vs = ms.wh.versions("_models")
    old = ms.wh.read("_models", version=vs[-2]).head()
    assert old["content_key"] == "v1"


def test_codebook_reuses_warehouse_artifact_across_sessions(
    spark, tmp_path, monkeypatch
):
    """Second 'session' (fresh process-level cache) must load the
    trained codebook from the warehouse store — proven by making
    retraining impossible."""
    emb = _emb(spark)
    key = str(tmp_path / "corpus_identity")
    got1 = sim.cosine_topk_ivf(
        emb, 3, k=5, n_centroids=4, n_probe=2, kmeans_iters=1, corpus_key=key
    ).collect()
    # simulate a fresh session: the in-process cache is empty
    sim._CODEBOOK_CACHE.clear()

    def _boom(*a, **k):
        raise AssertionError("retrained instead of loading the warehouse artifact")

    monkeypatch.setattr(sim, "kmeans_codebook", _boom)
    got2 = sim.cosine_topk_ivf(
        emb, 3, k=5, n_centroids=4, n_probe=2, kmeans_iters=1, corpus_key=key
    ).collect()
    assert [tuple(r) for r in got1] == [tuple(r) for r in got2]


def test_codebook_content_key_invalidates_on_param_change(spark, tmp_path):
    emb = _emb(spark)
    key = str(tmp_path / "corpus_identity2")
    sim.cosine_topk_ivf(
        emb, 3, k=5, n_centroids=4, n_probe=2, kmeans_iters=1, corpus_key=key
    ).collect()
    ck4 = (key, 4, 1)
    ck8 = (key, 8, 1)
    store = sim._default_model_store(spark, ck4)
    assert store.get(
        f"codebook:{ck4!r}", content_key=sim._codebook_content_key(ck4)
    ) is not None
    # different hyper-params → different artifact row, absent until trained
    assert store.get(
        f"codebook:{ck8!r}", content_key=sim._codebook_content_key(ck8)
    ) is None


def test_default_store_resolves_spark_bxg_model_root(spark, tmp_path):
    """spark.bxg.modelRoot (the production setting) overrides the
    tempdir fallback — artifacts land under the configured root."""
    root = str(tmp_path / "shared_models")
    ck = (str(tmp_path / "corpus_x"), 4, 1)
    try:
        spark.conf.set("spark.bxg.modelRoot", root)
        store = sim._default_model_store(spark, ck)
        assert str(store.wh.root).startswith(root)
        store.put("m", {"v": 1}, kind="k", content_key="c1")
        assert store.get("m", content_key="c1") == {"v": 1}
        import pathlib

        assert list(pathlib.Path(root).glob("corpus_*/_manifests/_models/v*.json"))
    finally:
        spark.conf.unset("spark.bxg.modelRoot")
    # conf cleared → tempdir fallback, a DIFFERENT root
    fallback = sim._default_model_store(spark, ck)
    assert not str(fallback.wh.root).startswith(root)
