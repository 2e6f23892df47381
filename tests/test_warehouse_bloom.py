"""Per-file bloom filters: the equality-skipping lever for
high-cardinality columns whose zone maps are useless (uniformly
distributed values overlap every file's min/max range).

Invariants: scan == read().filter always (blooms are advisory; false
positives cost a file read, false negatives are impossible); sidecars
are carried with their files across commits — including by writers
that never heard of blooms — and vacuumed with them."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from binaryx_graph_spark.sources.warehouse import (
    Warehouse,
    _bloom_may_contain,
    _bloom_params,
    _build_file_bloom,
)


def _fns(spark, n):
    return spark.range(n).select(
        F.col("id").cast("string").alias("uid"),
        F.md5(F.col("id").cast("string")).alias("name"),
        F.lit("").alias("address"),
        F.col("id").cast("long").alias("size"),
        F.lit("Internal").alias("type"),
    )


def test_bloom_point_scan_prunes_where_zone_maps_cannot(spark, tmp_path):
    wh = Warehouse(
        spark, str(tmp_path / "wh"), bloom_columns={"functions": ["name"]}
    )
    wh.merge_batch_incremental({"functions": _fns(spark, 20000)})
    m = wh._manifest("functions", wh.versions("functions")[-1])
    total = sum(len(v) for v in m["buckets"].values())
    assert len(m["blooms"]) == total, "every file gets a bloom sidecar"
    target = spark.sql("SELECT md5('777') AS h").collect()[0]["h"]
    # zone maps CANNOT prune this: the target is inside ~every file's
    # min/max range of uniform hashes
    inside = sum(
        1
        for st in m["stats"].values()
        if "name" in st and st["name"][0] <= target <= st["name"][1]
    )
    assert inside >= 0.9 * total
    out, diag = wh.scan("functions", [("name", "=", target)], with_diagnostics=True)
    assert diag["files_read"] <= max(2, total // 8) < diag["files_total"]
    assert [r["uid"] for r in out.collect()] == ["777"]
    # definitely-absent value: ~0 files at fpp=1%
    out2, diag2 = wh.scan(
        "functions", [("name", "=", "not_a_hash_at_all")], with_diagnostics=True
    )
    assert diag2["files_read"] <= max(2, total // 8)
    assert out2.count() == 0
    # IN-list: union of probes
    t2 = spark.sql("SELECT md5('8190') AS h").collect()[0]["h"]
    out3, diag3 = wh.scan(
        "functions", [("name", "in", [target, t2])], with_diagnostics=True
    )
    assert diag3["files_read"] <= max(4, total // 4)
    assert sorted(r["uid"] for r in out3.collect()) == ["777", "8190"]


def test_blooms_carried_by_unconfigured_writers_and_vacuumed(spark, tmp_path):
    root = str(tmp_path / "wh")
    wh = Warehouse(spark, root, bloom_columns={"functions": ["name"]})
    wh.merge_batch_incremental({"functions": _fns(spark, 20000)})
    n0 = len(wh._manifest("functions", wh.versions("functions")[-1])["blooms"])
    plain = Warehouse(spark, root)  # bloom-unaware writer
    plain.merge_batch_incremental({"functions": _fns(spark, 1)}, batch_seq=2)
    m2 = plain._manifest("functions", plain.versions("functions")[-1])
    # untouched files keep their blooms; the rewritten bucket's new file
    # has none (this writer doesn't build them) — safe, just unpruned
    assert n0 - 2 <= len(m2["blooms"]) < n0 + 2
    target = spark.sql("SELECT md5('777') AS h").collect()[0]["h"]
    out, diag = plain.scan(
        "functions", [("name", "=", target)], with_diagnostics=True
    )
    assert [r["uid"] for r in out.collect()] == ["777"]
    assert diag["files_read"] < diag["files_total"]
    plain.vacuum(keep_last=0)
    live_refs = set(
        plain._manifest("functions", plain.versions("functions")[-1])
        .get("blooms", {})
        .values()
    )
    on_disk = {p.name for p in (Path(root) / "_blooms" / "functions").glob("*.json")}
    assert on_disk == live_refs, "vacuum must sweep expired files' sidecars"


def test_bloom_primitives():
    m, k = _bloom_params(1000)
    assert m >= 8 * 1000 and m & (m - 1) == 0 and 1 <= k <= 16
    import json
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/f.parquet"
        pq.write_table(
            pa.table({"s": [f"v{i}" for i in range(500)], "x": list(range(500))}),
            path,
        )
        bl = _build_file_bloom(path, ["s", "x", "ghost"])
        assert set(bl) == {"s", "x"}
        json.dumps(bl)  # sidecar-serializable
        assert all(_bloom_may_contain(bl["s"], f"v{i}") for i in range(500))
        assert all(_bloom_may_contain(bl["x"], i) for i in range(500))
        misses = sum(
            1 for i in range(1000) if _bloom_may_contain(bl["s"], f"absent{i}")
        )
        assert misses <= 50, f"fpp way over target: {misses}/1000"
