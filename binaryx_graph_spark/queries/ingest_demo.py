"""Oracle-checked ingest ETL (SURVEY.md §2.2): run the full JSON →
graph-warehouse pipeline on the deterministic micro-graph fixture and
compare the resulting node/edge tables against hand-computed expected rows
(static VALUES oracles).

The Spark side genuinely executes the whole E1-E12 dataflow — JSON scan,
permissive projection, UID generation, address-map resolution, MERGE
dedup — so any regression in those operators breaks the value hash.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures.micro_graph import (
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
from ..operators.ingest import build_graph_tables
from ..registry import register
from ..sources.json_source import read_analysis_json

_CACHE: dict[str, dict[str, DataFrame]] = {}

_FIXTURE_TABLES = [
    "binaries", "functions", "strings", "libraries", "contains", "imports",
    "imports_library", "belongs_to", "calls", "contains_string", "import_stats",
]


def _fixture_version() -> str:
    """Content hash of the fixture + ingest implementation — the ETL
    output is a pure function of these, so a disk cache keyed by this
    hash is always coherent."""
    import hashlib

    import binaryx_graph_spark.fixtures.micro_graph as mg
    import binaryx_graph_spark.operators.ingest as ing
    import binaryx_graph_spark.sources.json_source as js

    h = hashlib.sha256()
    for mod in (mg, ing, js):
        h.update(Path(mod.__file__).read_bytes())
    return h.hexdigest()[:16]


def graph_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """Micro-graph fixture as warehouse tables. First build per MACHINE
    runs the real JSON→ETL pipeline and persists parquet to a
    content-addressed /tmp cache; later sessions (e.g. the driver
    running each gate query in a fresh session) reload in ~0.5s instead
    of re-running the multi-job ingest."""
    key = str(id(spark))
    if key in _CACHE:
        return _CACHE[key]

    import os

    root = Path(tempfile.gettempdir()) / f"bxg_fixture_wh_{_fixture_version()}"
    if not root.exists():
        d = write_fixture(Path(tempfile.mkdtemp(prefix="bxg_fixture_")))
        docs = read_analysis_json(spark, d)
        tables = build_graph_tables(docs)
        stage = Path(tempfile.mkdtemp(prefix="bxg_fixture_stage_"))
        for name in _FIXTURE_TABLES:
            tables[name].coalesce(1).write.mode("overwrite").parquet(str(stage / name))
        try:
            os.rename(stage, root)  # atomic publish; loser of a race keeps its stage
        except OSError:
            pass
    _CACHE[key] = {
        name: spark.read.parquet(str(root / name)).cache() for name in _FIXTURE_TABLES
    }
    return _CACHE[key]


@register(
    "ingest_function_nodes",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}',     'main',        'Export',   '0x401000', CAST(-1  AS BIGINT)),
      ('{UID_HELPER_A}',   'helper',      'Internal', '0x401100', CAST(128 AS BIGINT)),
      ('{UID_WORKER_A}',   'worker',      'Internal', '0x401200', CAST(-1  AS BIGINT)),
      ('{UID_EXPORTED_A}', 'exported_fn', 'Export',   '0x401300', CAST(-1  AS BIGINT)),
      ('{UID_MAIN_B}',     'main',        'Internal', '0x401000', CAST(64  AS BIGINT)),
      ('{UID_CREATEFILE}', 'CreateFileA', 'Import',   '',         CAST(-1  AS BIGINT))
    ) AS t(uid, name, type, address, size)
    ORDER BY uid
    """,
    tags=("ingest",),
)
def ingest_function_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2/E5/E6/E9: function-node upsert across Internal ∪ Import ∪ Export
    with per-binary and global UID scopes."""
    return graph_tables(spark)["functions"].orderBy("uid")


@register(
    "ingest_call_edges",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{UID_MAIN_A}',   '{UID_HELPER_A}',   '0x401010', 'Direct'),
      ('{UID_MAIN_A}',   '{UID_CREATEFILE}', '0x401020', 'Indirect'),
      ('{UID_HELPER_A}', '{UID_WORKER_A}',   '0x401110', 'Direct'),
      ('{UID_WORKER_A}', '{UID_HELPER_A}',   '0x401210', 'Direct'),
      ('{UID_WORKER_A}', '{UID_WORKER_A}',   '0x401220', 'Tail')
    ) AS t(src_uid, dst_uid, "offset", call_type)
    ORDER BY src_uid, dst_uid
    """,
    tags=("ingest",),
)
def ingest_call_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E7/E8: address-map resolution (imports>functions>exports precedence,
    normalized-then-raw fallback) + CALLS pair-collapse MERGE; unresolved
    rows skipped."""
    return graph_tables(spark)["calls"].orderBy("src_uid", "dst_uid")


@register(
    "ingest_string_nodes",
    oracle="""
    SELECT 'str:' || sha256(v) AS uid, v AS value
    FROM (VALUES ('Pay Bitcoin'), ('hello'), ('barestr')) AS t(v)
    ORDER BY uid
    """,
    tags=("ingest",),
)
def ingest_string_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3/E11: NUL-trim + sha256 string UIDs, object-or-bare-string items,
    global dedup across binaries."""
    return graph_tables(spark)["strings"].orderBy("uid")


@register(
    "ingest_merge_last_write_wins",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{HASH_A}', 'mal_a_v2.exe', CAST(8192 AS BIGINT)),
      ('{HASH_B}', 'mal_b.elf',    CAST(2048 AS BIGINT))
    ) AS t(hash, filename, file_size)
    ORDER BY hash
    """,
    tags=("ingest",),
)
def ingest_merge_last_write_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E9/S6: warehouse MERGE across two batches — re-importing binary A
    with a changed filename/size must overwrite (last write wins,
    importer.rs:86-138) while binary B is untouched. Runs the REAL
    parquet warehouse merge path, not just the in-batch dedup."""
    import copy
    import json
    import tempfile
    from pathlib import Path

    from ..fixtures.micro_graph import DOC_A
    from ..sources.warehouse import Warehouse

    _NODE_TABLES = ["binaries", "functions", "strings", "libraries"]
    key = f"merge_{id(spark)}"
    if key not in _CACHE:
        root = Path(tempfile.mkdtemp(prefix="bxg_merge_")) / "wh"
        wh = Warehouse(spark, str(root))
        # no initialize(): merge_batch creates tables on first write,
        # skipping 10 empty-table write jobs
        batch1 = graph_tables(spark)
        wh.merge_batch({k: batch1[k] for k in _NODE_TABLES}, batch_seq=1)

        doc_a2 = copy.deepcopy(DOC_A)
        doc_a2["binary_info"]["name"] = "mal_a_v2.exe"
        doc_a2["binary_info"]["file_size"] = 8192
        d2 = Path(tempfile.mkdtemp(prefix="bxg_merge_in2_"))
        (d2 / "a2.json").write_text(json.dumps(doc_a2))
        docs2 = read_analysis_json(spark, str(d2))
        batch2 = build_graph_tables(docs2)
        wh.merge_batch({k: batch2[k] for k in _NODE_TABLES}, batch_seq=2)
        _CACHE[key] = {"binaries": wh.read("binaries").cache()}
    return (
        _CACHE[key]["binaries"]
        .select("hash", "filename", "file_size")
        .orderBy("hash")
    )


@register(
    "python_datasource_functions",
    oracle=f"""
    SELECT * FROM (VALUES
      ('{HASH_A}', 'main',   '0x401000', CAST(256 AS BIGINT),  'a.json'),
      ('{HASH_A}', 'helper', '4198656',  CAST(128 AS BIGINT),  'a.json'),
      ('{HASH_A}', 'worker', '4198912',  CAST(NULL AS BIGINT), 'a.json'),
      ('{HASH_B}', 'main',   '0x401000', CAST(64 AS BIGINT),   'b.json')
    ) AS t(binary_hash, fn_name, address, size, source_file)
    ORDER BY binary_hash, fn_name
    """,
    tags=("ingest", "source"),
)
def python_datasource_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: the fixture read through a Spark 4 PYTHON
    DATASOURCE (pyspark.sql.datasource) — file-granular partition
    planning on the driver, executor-side Python parsing, raw function
    rows verbatim.  Pins the custom-source machinery end-to-end
    (registration, partition planning, Arrow row transport) against a
    static oracle."""
    from ..sources.pyds import register_analysis_datasource

    register_analysis_datasource(spark)
    d = write_fixture(Path(tempfile.mkdtemp(prefix="bxg_pyds_")))
    return (
        spark.read.format("analysis_json_py")
        .option("path", d)
        .load()
        .orderBy("binary_hash", "fn_name")
    )


@register(
    "python_datasource_stream",
    oracle="""
    SELECT CAST(i % 7 AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum((i * 37) % 1000) AS BIGINT) AS total_cents
    FROM range(0, 60) t(i)
    GROUP BY 1
    ORDER BY user_id
    """,
    tags=("ingest", "source", "streaming"),
)
def python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family extension: a pure-Python STREAMING source (Spark 4
    SimpleDataSourceStreamReader) drained to a parquet file sink with a
    persistent checkpoint — restarted availableNow runs resume from the
    committed offset (each run consumes the next prefetched batch), so
    the loop pins the offset/commit/replay contract end-to-end:
    exactly-once delivery of the full bounded feed across restarts,
    aggregated and checked against the feed formula replayed in SQL."""
    import tempfile
    from pathlib import Path

    from ..sources.pyds import register_event_feed_datasource

    register_event_feed_datasource(spark)
    base = Path(tempfile.mkdtemp(prefix="bxg_pyfeed_"))
    out, ckpt = str(base / "out"), str(base / "ckpt")
    prev = -1
    for _ in range(12):  # bounded restart loop; stops when no progress
        q = (
            spark.readStream.format("event_feed_py")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n = spark.read.parquet(out).count() if Path(out).exists() else 0
        if n == prev:
            break
        prev = n
    return (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("amount_cents").alias("total_cents"),
        )
        .orderBy("user_id")
    )
