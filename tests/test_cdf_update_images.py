"""CDF UPDATE PRE/POST IMAGES (Delta's change types) — batch
``read_changes(update_images=True)``, the ``warehouse_cdf`` streaming
source's ``updateImages`` option, and the replication consumer
applying postimages natively.

The contract: a keyed delete+insert pair within one version diff is a
row MUTATION (update_preimage/update_postimage); a key that only
disappears is a delete; a key that only appears is an insert; NULL-key
rows and unkeyed tables keep plain labels.  Multiset identity holds
with preimage≡delete, postimage≡insert.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from binaryx_graph_spark.sources.warehouse import Warehouse


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
    w.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    return w


def test_batch_update_images_labels(spark, wh):
    v0 = wh.versions("functions")[-1]
    # one commit mixing mutation, deletion, and insertion
    src = spark.createDataFrame(
        [("5", 111), ("6", 222), ("7", -1), ("900007", 7)],
        "uid string, new_size long",
    )
    wh.merge_into(
        "functions",
        src,
        when_matched_update={"size": F.col("s.new_size")},
        when_matched_condition=F.col("s.new_size") >= 0,
        when_matched_delete=F.col("s.new_size") < 0,
        when_not_matched_insert=True,
    )
    ch = wh.read_changes("functions", v0, update_images=True)
    got = {
        (r["uid"], r["_change"]): True for r in ch.collect()
    }
    assert set(got) == {
        ("5", "update_preimage"), ("5", "update_postimage"),
        ("6", "update_preimage"), ("6", "update_postimage"),
        ("7", "delete"),
        ("900007", "insert"),
    }
    # postimages carry the NEW values, preimages the OLD
    rows = {(r["uid"], r["_change"]): r["size"] for r in ch.collect()}
    assert rows[("5", "update_postimage")] == 111
    assert rows[("5", "update_preimage")] == 5
    # default stays the plain vocabulary
    plain = {r["_change"] for r in wh.read_changes("functions", v0).collect()}
    assert plain == {"insert", "delete"}


def test_batch_update_images_multiset_identity(spark, wh):
    v0 = wh.versions("functions")[-1]
    wh.update_where_dv(
        "functions", [("size", "between", (10, 19))], {"name": F.lit("u")}
    )
    ch = wh.read_changes("functions", v0, update_images=True)
    pre = ch.filter(F.col("_change") == "update_preimage").drop("_change")
    post = ch.filter(F.col("_change") == "update_postimage").drop("_change")
    assert pre.count() == 10 and post.count() == 10
    old = wh.read("functions", version=v0)
    new = wh.read("functions")
    rebuilt = old.exceptAll(pre).unionAll(post)
    assert rebuilt.exceptAll(new).count() == 0
    assert new.exceptAll(rebuilt).count() == 0


def test_key_churn_is_not_an_update(spark, wh):
    v0 = wh.versions("functions")[-1]
    # delete key A and insert key B in ONE commit: no shared key → no
    # relabeling, even though the diff has a delete and an insert
    wh.merge_into(
        "functions",
        spark.createDataFrame([("30",), ("900030",)], "uid string"),
        when_matched_delete=True,
        when_not_matched_insert=True,
    )
    ch = wh.read_changes("functions", v0, update_images=True)
    got = {(r["uid"], r["_change"]) for r in ch.collect()}
    assert got == {("30", "delete"), ("900030", "insert")}


def test_streaming_update_images_match_batch(spark, tmp_path):
    import uuid

    from binaryx_graph_spark.sources.cdf_stream import (
        register_warehouse_cdf_datasource,
    )

    root = str(tmp_path / "wh_cdf")
    wh = Warehouse(spark, root)
    register_warehouse_cdf_datasource(spark)
    wh.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    wh.update_where_dv(
        "functions", [("size", "between", (10, 14))], {"name": F.lit("u")}
    )
    wh.delete_where_dv("functions", [("uid", "=", "100")])

    name = f"cdf_img_{uuid.uuid4().hex[:10]}"
    (
        spark.readStream.format("warehouse_cdf")
        .option("root", root)
        .option("table", "functions")
        .option("updateImages", "true")
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = spark.table(name)
    c = {
        (r["_version"], r["_change"]): r["n"]
        for r in got.groupBy("_version", "_change")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert c == {
        (0, "insert"): 500,
        (1, "update_preimage"): 5,
        (1, "update_postimage"): 5,
        (2, "delete"): 1,
    }
    posts = got.filter("_change = 'update_postimage'")
    assert {r["name"] for r in posts.collect()} == {"u"}


def test_replication_consumes_postimages(spark, tmp_path):
    from binaryx_graph_spark.sources.replication import replicate

    src = Warehouse(spark, str(tmp_path / "src"))
    dst = Warehouse(spark, str(tmp_path / "dst"))
    src.clear()
    dst.clear()
    offset = str(tmp_path / "offsets.json")
    src.merge_batch_incremental({"functions": _fns(spark)}, n_buckets=8)
    replicate(src, dst, "functions", offset, update_images=True)
    # a mutation + a true delete + an insert, replicated via images
    src.update_where_dv(
        "functions", [("uid", "=", "7")], {"size": F.lit(7777).cast("long")}
    )
    src.delete_where_dv("functions", [("uid", "=", "8")])
    src.merge_batch_incremental(
        {
            "functions": spark.createDataFrame(
                [("900001", "new", "", 1, "Internal")],
                "uid string, name string, address string, size long, type string",
            )
        },
        batch_seq=99,
    )
    replicate(src, dst, "functions", offset, update_images=True)
    s = sorted(tuple(r) for r in src.read("functions").collect())
    d = sorted(tuple(r) for r in dst.read("functions").collect())
    assert s == d
