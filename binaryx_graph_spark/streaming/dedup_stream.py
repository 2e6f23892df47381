"""Streaming continuous dedup: every arriving micro-batch near-dup-checks
against the standing corpus via the accumulated MinHash band index.

The production shape for CONTINUOUS ingestion (the batch twin is
``dedup_incremental_batch``): state carried across micro-batches is the
band index — O(corpus) band rows, not corpus text — plus the corpus
needed only for candidate verification. Each batch pays O(batch)
banding; the corpus is never re-banded.

Contract (what the gate pins): the UNION of per-batch outputs equals
the GLOBAL MinHash/LSH pass over all documents — every near-dup pair is
discovered exactly once, when its later-arriving member lands, as a
(new, old) or (new, new) pair. So replaying a corpus through the stream
reproduces the batch pass bit-for-bit, banding false-negatives and all.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..model import load_table
from ..operators.dedup import incremental_minhash_near_dup, minhash_band_index

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _stage_batches(docs, stage: str, filters) -> None:
    """Write each filtered slice as one parquet file ``batch_<i>.parquet``
    — the staged arrival order for a maxFilesPerTrigger=1 drain (shared
    by the minhash and paragraph streaming harnesses)."""
    for b, pred in enumerate(filters):
        tmp = f"{stage}/_w{b}"
        docs.filter(pred).coalesce(1).write.parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.startswith("part-"))
        os.rename(f"{tmp}/{part}", f"{stage}/batch_{b}.parquet")
        shutil.rmtree(tmp)


def streaming_incremental_dedup(
    spark: SparkSession,
    sf_dir: str,
    *,
    n: int = 3,
    threshold: float = 0.3,
    arrival_batches: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Drain the documents corpus as ``arrival_batches`` micro-batches
    (one file each, maxFilesPerTrigger=1) through a foreachBatch that
    dedups each batch against the accumulated index, then return the
    unioned pair set as a static frame."""
    stage = tempfile.mkdtemp(prefix="bxg_dedup_stream_")
    docs = load_table(spark, sf_dir, "documents")
    _stage_batches(
        docs, stage,
        [F.col("doc_id") % arrival_batches == b for b in range(arrival_batches)],
    )

    empty_docs = spark.createDataFrame([], DOCS_SCHEMA)
    state = {
        "corpus": empty_docs.localCheckpoint(eager=True),
        "bands": minhash_band_index(empty_docs, "doc_id", "text", n=n).localCheckpoint(
            eager=True
        ),
        "pairs": [],
    }

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)  # valid beyond this call
        pairs = incremental_minhash_near_dup(
            batch,
            state["corpus"],
            "doc_id",
            "text",
            n=n,
            threshold=threshold,
            corpus_bands=state["bands"],
        ).localCheckpoint(eager=True)
        state["pairs"].append(pairs)
        state["bands"] = (
            state["bands"]
            .unionByName(minhash_band_index(batch, "doc_id", "text", n=n))
            .localCheckpoint(eager=True)
        )
        state["corpus"] = state["corpus"].unionByName(batch).localCheckpoint(eager=True)

    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if stats is not None:
        # observability for tests: prove the drain really ran as
        # multiple micro-batches (one batch would trivially satisfy the
        # union contract without exercising the incremental path)
        stats["n_batches"] = len(state["pairs"])
        stats["pairs_per_batch"] = [p.count() for p in state["pairs"]]
    out = state["pairs"][0]
    for p in state["pairs"][1:]:
        out = out.unionByName(p)
    return out


def streaming_paragraph_dedup(
    spark: SparkSession,
    sf_dir: str,
    *,
    words: int | None = None,
    arrival_batches: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Continuous paragraph-level dedup: the corpus replayed as
    ascending doc_id-range micro-batches (maxFilesPerTrigger=1,
    availableNow); each foreachBatch keeps only paragraphs unseen in
    the ACCUMULATED kept-paragraph index, then appends its fresh
    paragraphs to the index.

    Contract (gate-pinned): because batches arrive in ascending doc_id
    ranges, batch-first == corpus-first, so the UNION of per-batch
    outputs equals the global ``paragraph_dedup`` pass bit-for-bit.
    State carried across batches is the kept-paragraph index — distinct
    paragraphs, not corpus text."""
    from ..operators.dedup import PARA_WORDS, incremental_paragraph_dedup

    w = PARA_WORDS if words is None else words
    stage = tempfile.mkdtemp(prefix="bxg_para_stream_")
    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]  # setup-only scalar
    bounds = [(i * (max_id + 1)) // arrival_batches for i in range(arrival_batches + 1)]
    _stage_batches(
        docs, stage,
        [(F.col("doc_id") >= bounds[b]) & (F.col("doc_id") < bounds[b + 1])
         for b in range(arrival_batches)],
    )

    state = {
        "index": spark.createDataFrame([], "para string").localCheckpoint(eager=True),
        "outs": [],
    }

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        batch = batch_df.localCheckpoint(eager=True)
        result, fresh = incremental_paragraph_dedup(batch, state["index"], words=w)
        state["outs"].append(result.localCheckpoint(eager=True))
        state["index"] = state["index"].unionByName(fresh).localCheckpoint(eager=True)

    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if stats is not None:
        stats["n_batches"] = len(state["outs"])
        stats["docs_per_batch"] = [o.count() for o in state["outs"]]
        stats["index_size"] = state["index"].count()
    out = state["outs"][0]
    for o in state["outs"][1:]:
        out = out.unionByName(o)
    return out


def stream_quality_gate(
    spark: SparkSession,
    sf_dir: str,
    *,
    arrival_batches: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """The quality-classifier gate run as a STREAM: documents arrive in
    ``arrival_batches`` micro-batches; each batch flows through the
    linear classifier (stateless per-doc scoring — no cross-batch
    state, so the streaming plan needs no watermark) and contributes a
    (batch_id, n_docs, n_keep) row.  The batch twin is the same
    classifier grouped by the arrival split — stream/batch agreement is
    the oracle contract, like the windowed-count twins."""
    from ..operators.textstats import classifier_score

    stage = tempfile.mkdtemp(prefix="bxg_quality_stream_")
    docs = load_table(spark, sf_dir, "documents")
    _stage_batches(
        docs, stage,
        [F.col("doc_id") % arrival_batches == b for b in range(arrival_batches)],
    )

    rows: list[DataFrame] = []

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        scored = classifier_score(batch_df, "doc_id", "text")
        rows.append(
            scored.groupBy((F.col("doc_id") % arrival_batches).alias("batch_id"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(F.col("keep").cast("long")).cast("long").alias("n_keep"),
            )
            .localCheckpoint(eager=True)
        )

    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if stats is not None:
        stats["n_batches"] = len(rows)
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("batch_id")


def streaming_cdc_dedup(
    spark: SparkSession,
    sf_dir: str,
    *,
    k: int = 50,
    arrival_batches: int = 3,
    stats: dict | None = None,
) -> DataFrame:
    """Continuous content-defined-chunk duplicate mining: the corpus
    replayed as ascending doc_id-range micro-batches; each foreachBatch
    chunkifies ONLY its own documents (:func:`~binaryx_graph_spark.
    operators.dedup.cdc_chunks`) and merges per-chunk stats into the
    accumulated index by summing.

    Contract (gate-pinned): batches partition the documents, so
    occurrence counts AND distinct-doc counts are exactly additive —
    the final index equals the global ``cdc_duplicate_chunks`` pass
    bit-for-bit.  State carried across batches is the chunk-stat index
    (chunk-cardinality, never corpus text); per batch the cost is the
    batch's own chunking + one chunk-key merge."""
    from ..operators.dedup import cdc_chunks

    stage = tempfile.mkdtemp(prefix="bxg_cdc_stream_")
    docs = load_table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]  # setup-only scalar
    if max_id is None:  # empty corpus: nothing to stream (r5 ADVICE)
        if stats is not None:
            stats["n_batches"] = 0
            stats["index_size"] = 0
        return spark.createDataFrame(
            [], "chunk_md5 string, n_tokens long, n_occurrences long, n_docs long"
        )
    bounds = [(i * (max_id + 1)) // arrival_batches for i in range(arrival_batches + 1)]
    _stage_batches(
        docs, stage,
        [(F.col("doc_id") >= bounds[b]) & (F.col("doc_id") < bounds[b + 1])
         for b in range(arrival_batches)],
    )

    state = {
        "index": spark.createDataFrame(
            [], "chunk_md5 string, n_tokens long, n_occurrences long, n_docs long"
        ).localCheckpoint(eager=True),
        "n_batches": 0,
    }

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        part = (
            cdc_chunks(batch_df.localCheckpoint(eager=True), "doc_id", "text")
            .groupBy("chunk_md5", "n_tokens")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_occurrences"),
                F.countDistinct("doc_id").cast("long").alias("n_docs"),
            )
        )
        state["index"] = (
            state["index"].unionByName(part)
            .groupBy("chunk_md5", "n_tokens")
            .agg(
                F.sum("n_occurrences").cast("long").alias("n_occurrences"),
                F.sum("n_docs").cast("long").alias("n_docs"),
            )
            .localCheckpoint(eager=True)
        )
        state["n_batches"] += 1

    q = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
        .writeStream.foreachBatch(process)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if stats is not None:
        stats["n_batches"] = state["n_batches"]
        stats["index_size"] = state["index"].count()
    return (
        state["index"]
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.desc("n_occurrences"), "chunk_md5")
        .limit(k)
        .select("chunk_md5", "n_tokens", "n_occurrences", "n_docs")
    )
