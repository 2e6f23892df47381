"""Ingest ETL (E1-E12) against the micro-graph fixture — asserts the
reference's merge/dedup/resolution semantics (SURVEY.md §2.2)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from binaryx_graph_spark.operators.ingest import build_graph_tables
from binaryx_graph_spark.sources.json_source import read_analysis_json, validate_documents
from binaryx_graph_spark.sources.warehouse import Warehouse

from .fixtures import (
    HASH_A,
    HASH_B,
    UID_CREATEFILE,
    UID_EXPORTED_A,
    UID_HELPER_A,
    UID_MAIN_A,
    UID_MAIN_B,
    UID_WORKER_A,
    write_fixture,
)


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    d = write_fixture(tmp_path_factory.mktemp("ingest"))
    docs = read_analysis_json(spark, d)
    t = build_graph_tables(docs)
    return {k: v.cache() for k, v in t.items()}


def test_validation_passes_fixture(spark, tmp_path_factory):
    d = write_fixture(tmp_path_factory.mktemp("val"))
    docs = read_analysis_json(spark, d)
    assert validate_documents(docs).count() == 0


def test_raw_validation_catalog(spark, tmp_path_factory):
    """validate_raw_json reproduces the reference's validate_data error
    catalog (client.rs:42-81) per seeded file; valid docs error-free."""
    from binaryx_graph_spark.fixtures.micro_graph import write_validation_fixture
    from binaryx_graph_spark.sources.json_source import validate_raw_json

    d = write_validation_fixture(tmp_path_factory.mktemp("rawval"))
    rows = validate_raw_json(spark, d).collect()
    by_file: dict[str, set[str]] = {}
    for r in rows:
        name = r["source_file"].rsplit("/", 1)[-1]
        by_file.setdefault(name, set()).add(r["error"])
    assert "a.json" not in by_file and "b.json" not in by_file
    assert by_file["v1_no_binary_info.json"] == {"binary_info is required"}
    assert by_file["v3_binary_info_string.json"] == {"binary_info must be an object"}
    assert by_file["v4_missing_fields.json"] == {
        f"binary_info missing required field: {f}"
        for f in ("file_path", "file_size", "file_type", "hashes")
    }
    assert by_file["v5_missing_name_bad_exports.json"] == {
        "binary_info missing required field: name",
        "exports must be an array",
    }
    assert by_file["v6_bad_arrays.json"] == {
        "functions must be an array",
        "strings must be an array",
        "imports must be an array",
    }


def test_raw_validation_null_and_string_arrays(spark, tmp_path_factory):
    """r5 ADVICE: explicit JSON null and string scalars in section
    fields are 'must be an array' errors (client.rs:61-74
    Value::is_array); the array-like-string residual is pinned as the
    accepted divergence."""
    from binaryx_graph_spark.fixtures.micro_graph import write_validation_nulls_fixture
    from binaryx_graph_spark.sources.json_source import validate_raw_json

    d = write_validation_nulls_fixture(tmp_path_factory.mktemp("rawvaln"))
    rows = validate_raw_json(spark, d).collect()
    by_file: dict[str, set[str]] = {}
    for r in rows:
        name = r["source_file"].rsplit("/", 1)[-1]
        by_file.setdefault(name, set()).add(r["error"])
    assert "ok.json" not in by_file
    assert by_file["n1_null_sections.json"] == {
        "functions must be an array",
        "strings must be an array",
    }
    assert by_file["n2_string_exports.json"] == {"exports must be an array"}
    assert by_file["n3_bool_imports.json"] == {"imports must be an array"}
    # documented residual: string content that parses as JSON-array text
    assert "n4_arraylike_string.json" not in by_file


def test_binaries(tables):
    rows = {r["hash"]: r for r in tables["binaries"].collect()}
    assert set(rows) == {HASH_A, HASH_B}
    assert rows[HASH_A]["format"] == "PE"
    assert rows[HASH_A]["filename"] == "mal_a.exe"
    assert rows[HASH_B]["format"] == "Elf"  # SHA256 upper-key coalesced too
    assert rows[HASH_B]["arch"] == "x86_64"


def test_function_nodes_and_uids(tables):
    rows = {r["uid"]: r for r in tables["functions"].collect()}
    assert set(rows) == {
        UID_MAIN_A, UID_HELPER_A, UID_WORKER_A, UID_EXPORTED_A, UID_MAIN_B, UID_CREATEFILE,
    }
    assert rows[UID_HELPER_A]["address"] == "0x401100"  # bare hex normalized
    assert rows[UID_WORKER_A]["address"] == "0x401200"  # decimal normalized
    assert rows[UID_WORKER_A]["size"] == -1  # missing-size sentinel
    assert rows[UID_CREATEFILE]["type"] == "Import"
    assert rows[UID_EXPORTED_A]["type"] == "Export"
    # export at an already-mapped address RE-MERGEs the node: type/size
    # overwritten (MERGE…SET, importer.rs:115-121 via session.rs:226);
    # the unparseable 'bogus_export' was skipped (no extra node)
    assert rows[UID_MAIN_A]["type"] == "Export"
    assert rows[UID_MAIN_A]["size"] == -1
    # same name+address in two binaries → distinct per-binary uids
    assert UID_MAIN_A != UID_MAIN_B


def test_contains_edges(tables):
    pairs = {(r["binary_hash"], r["function_uid"]) for r in tables["contains"].collect()}
    assert (HASH_A, UID_MAIN_A) in pairs
    assert (HASH_B, UID_MAIN_B) in pairs
    assert len(pairs) == 4  # 3 internal A + 1 internal B


def test_import_edges_shared_global_node(tables):
    imp = {(r["binary_hash"], r["function_uid"]): r["address"] for r in tables["imports"].collect()}
    # both binaries import the SAME global node, different IAT addresses
    assert imp[(HASH_A, UID_CREATEFILE)] == "0x405000"
    assert imp[(HASH_B, UID_CREATEFILE)] == "0x404000"
    libs = {r["name"] for r in tables["libraries"].collect()}
    assert libs == {"kernel32"}  # lowercased, deduped across binaries
    bt = {(r["function_uid"], r["library_name"]) for r in tables["belongs_to"].collect()}
    assert bt == {(UID_CREATEFILE, "kernel32")}


def test_strings_nul_trim_and_bare(tables):
    vals = {r["value"] for r in tables["strings"].collect()}
    assert vals == {"Pay Bitcoin", "hello", "barestr"}  # NUL trimmed, bare kept
    cs = tables["contains_string"].collect()
    assert len(cs) == 4  # A: bitcoin+hello+barestr, B: bitcoin
    by_hash = {}
    for r in cs:
        by_hash.setdefault(r["binary_hash"], set()).add(r["string_uid"])
    # "Pay Bitcoin" is one global node contained by both binaries
    shared = by_hash[HASH_A] & by_hash[HASH_B]
    assert len(shared) == 1


def test_call_resolution(tables):
    edges = {(r["src_uid"], r["dst_uid"]): r for r in tables["calls"].collect()}
    assert set(edges) == {
        (UID_MAIN_A, UID_HELPER_A),
        (UID_MAIN_A, UID_CREATEFILE),  # resolved through IAT address
        (UID_HELPER_A, UID_WORKER_A),
        (UID_WORKER_A, UID_HELPER_A),
        (UID_WORKER_A, UID_WORKER_A),  # direct recursion self-loop
    }
    assert edges[(UID_MAIN_A, UID_CREATEFILE)]["call_type"] == "Indirect"  # case-folded
    assert edges[(UID_WORKER_A, UID_HELPER_A)]["call_type"] == "Direct"  # bogus → default
    assert edges[(UID_WORKER_A, UID_WORKER_A)]["call_type"] == "Tail"
    assert edges[(UID_HELPER_A, UID_WORKER_A)]["call_type"] == "Direct"  # missing → default
    # offsets stored raw
    assert edges[(UID_MAIN_A, UID_HELPER_A)]["offset"] == "0x401010"


def test_unresolved_calls_skipped_and_counted(tables):
    stats = {r["binary_hash"]: r for r in tables["import_stats"].collect()}
    assert stats[HASH_A]["calls_total"] == 6
    assert stats[HASH_A]["calls_skipped"] == 1  # 0x999999 source unmapped


def test_warehouse_merge_idempotent(spark, tables, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("wh") / "warehouse")
    wh = Warehouse(spark, root)
    wh.initialize()
    core = {k: v for k, v in tables.items() if k != "import_stats"}
    wh.merge_batch(core, batch_seq=1)
    n1 = {t: wh.read(t).count() for t in core}
    # re-merge the same batch → MERGE semantics keep counts identical
    wh.merge_batch(core, batch_seq=2)
    n2 = {t: wh.read(t).count() for t in core}
    assert n1 == n2
    assert n1["functions"] == 6
    assert n1["calls"] == 5


def test_parallel_calls_mode_keeps_call_sites(spark, tmp_path_factory):
    """parallel_calls=True preserves one edge per call SITE: add a second
    main→helper call at a different offset and check both modes."""
    import copy
    import json

    from binaryx_graph_spark.fixtures.micro_graph import DOC_A, DOC_B

    doc = copy.deepcopy(DOC_A)
    doc["calls"].append(
        {"from_address": "0x401000", "to_address": "4198656", "offset": "0x401044", "type": "direct"}
    )
    d = tmp_path_factory.mktemp("par") / "in"
    d.mkdir()
    (d / "a.json").write_text(json.dumps(doc))
    (d / "b.json").write_text(json.dumps(DOC_B))

    docs = read_analysis_json(spark, str(d))
    collapsed = build_graph_tables(docs)["calls"]
    parallel = build_graph_tables(docs, parallel_calls=True)["calls"]

    pair = (F.col("src_uid") == UID_MAIN_A) & (F.col("dst_uid") == UID_HELPER_A)
    assert collapsed.filter(pair).count() == 1  # reference pair-collapse
    rows = parallel.filter(pair).collect()
    assert {r["offset"] for r in rows} == {"0x401010", "0x401044"}  # both sites


def test_duplicate_binary_batch_per_file_map(spark, tmp_path_factory):
    """Per-file address-map scoping (ADVICE r1): when the SAME binary_hash
    arrives in two files of one batch, each file's calls resolve only
    against its OWN map — a call targeting an address defined solely in
    the OTHER file stays unresolved (skip-counted), exactly as the
    reference's fresh per-file session map behaves."""
    import json

    h = "f" * 64
    doc1 = {
        "binary_info": {"name": "dup_v1.exe", "hashes": {"sha256": h}, "file_size": 100,
                        "format": "PE", "arch": "x86"},
        "functions": [{"name": "alpha", "address": "0x1000", "size": 10}],
        # 0x2000 is defined ONLY in file 2 → must NOT resolve here
        "calls": [{"from_address": "0x1000", "to_address": "0x2000", "offset": "0x1004",
                   "type": "direct"}],
        "strings": [], "imports": [], "exports": [],
    }
    doc2 = {
        "binary_info": {"name": "dup_v2.exe", "hashes": {"sha256": h}, "file_size": 200,
                        "format": "PE", "arch": "x86"},
        "functions": [
            {"name": "alpha2", "address": "0x1000", "size": 11},
            {"name": "beta", "address": "0x2000", "size": 12},
        ],
        "calls": [{"from_address": "0x1000", "to_address": "0x1000", "offset": "0x1008",
                   "type": "tail"}],
        "strings": [], "imports": [], "exports": [],
    }
    d = tmp_path_factory.mktemp("dupbin") / "in"
    d.mkdir()
    (d / "f1.json").write_text(json.dumps(doc1))
    (d / "f2.json").write_text(json.dumps(doc2))

    t = build_graph_tables(read_analysis_json(spark, str(d)))

    # last file wins the binary node and the shared function node's name
    b = t["binaries"].collect()
    assert len(b) == 1 and b[0]["filename"] == "dup_v2.exe" and b[0]["file_size"] == 200
    fn = {r["uid"]: r["name"] for r in t["functions"].collect()}
    assert fn[f"{h}:0x1000"] == "alpha2"

    # file 1's cross-file call is skipped; file 2's self-call resolves
    calls = [(r["src_uid"], r["dst_uid"], r["call_type"]) for r in t["calls"].collect()]
    assert calls == [(f"{h}:0x1000", f"{h}:0x1000", "Tail")]
    stats = t["import_stats"].collect()[0]
    assert stats["calls_total"] == 2 and stats["calls_skipped"] == 1


def test_dense_rank_sharded_equals_global_window(spark):
    """The two-level ranking must equal the single-partition window
    exactly — random strings, duplicates removed upstream, shard counts
    above and below the value count."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from binaryx_graph_spark.functions.ranking import dense_rank_sharded

    rng = random.Random(42)
    names = list({f"file_{rng.randrange(10**9):09d}.json" for _ in range(5000)})
    vals = spark.createDataFrame([(n,) for n in names], "source_file string")
    w = Window.orderBy("source_file")
    want = {
        r["source_file"]: r["rk"]
        for r in vals.withColumn("rk", F.row_number().over(w)).collect()
    }
    for n_shards in (1, 7, 32, 9000):
        got = {
            r["source_file"]: r["ingest_seq"]
            for r in dense_rank_sharded(vals, "source_file", "ingest_seq", n_shards=n_shards).collect()
        }
        assert got == want, f"n_shards={n_shards}"


def test_read_analysis_json_sharded_rank_path_equal(spark, tmp_path, monkeypatch):
    """Force the >DRIVER_RANK_LIMIT branch on the 2-file fixture: the
    sharded ranking must produce the same (source_file, ingest_seq)
    assignment as the driver-built map."""
    from binaryx_graph_spark.sources import json_source
    from binaryx_graph_spark.sources.json_source import read_analysis_json

    from .fixtures import write_fixture

    d = write_fixture(tmp_path / "in")
    base = {
        (r["source_file"], r["ingest_seq"])
        for r in read_analysis_json(spark, d).select("source_file", "ingest_seq").collect()
    }
    monkeypatch.setattr(json_source, "DRIVER_RANK_LIMIT", 0)
    sharded = {
        (r["source_file"], r["ingest_seq"])
        for r in read_analysis_json(spark, d).select("source_file", "ingest_seq").collect()
    }
    assert sharded == base and len({s for s, _ in base}) == 2
