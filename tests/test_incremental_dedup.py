"""Incremental MinHash dedup == global MinHash restricted to the batch.

The contract that makes the incremental operator trustworthy: running
the batch against the corpus's precomputed band index must find exactly
the pairs a full-corpus MinHash/LSH pass would have found among pairs
touching the batch — same candidates, same verify, same banding
false-negatives.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.dedup import (
    incremental_minhash_near_dup,
    minhash_band_index,
    minhash_near_dup,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(
        (r["doc_a"], r["doc_b"], r["n_common"], r["n_a"], r["n_b"], round(r["jaccard"], 12))
        for r in df.collect()
    )


def test_incremental_equals_global_restricted(spark):
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)

    got = _rows(incremental_minhash_near_dup(new, corpus, "doc_id", "text", n=3, threshold=0.3))
    want = _rows(
        minhash_near_dup(docs, "doc_id", "text", n=3, threshold=0.3).filter(
            (F.col("doc_a") % 7 == 0) | (F.col("doc_b") % 7 == 0)
        )
    )
    assert got == want and len(got) > 0


def test_incremental_accepts_precomputed_index(spark):
    docs = load_table(spark, SF, "documents")
    new = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    idx = minhash_band_index(corpus, "doc_id", "text", n=3).localCheckpoint(eager=True)

    with_idx = _rows(
        incremental_minhash_near_dup(
            new, corpus, "doc_id", "text", n=3, threshold=0.3, corpus_bands=idx
        )
    )
    without = _rows(
        incremental_minhash_near_dup(new, corpus, "doc_id", "text", n=3, threshold=0.3)
    )
    assert with_idx == without


def test_estimate_band_candidates_exact_per_band(spark):
    """The bucket-size estimator prices each band EXACTLY (sum of
    C(c,2) == the band's non-distinct pair-join count) — the pre-flight
    for the band-count knob (SCALE.md candidate-law addendum)."""
    from pyspark.sql import functions as F

    from binaryx_graph_spark.operators.dedup import (
        estimate_band_candidates,
        lsh_bands,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"common prefix text {i % 7} tail {i % 3}") for i in range(60)],
        "doc_id long, text string",
    )
    bands = lsh_bands(minhash_signatures(docs, "doc_id", "text")).cache()
    est = {int(r["band_id"]): int(r["n_pairs"]) for r in estimate_band_candidates(bands).collect()}
    true_per_band = {
        int(r["band_id"]): int(r["n"])
        for r in (
            bands.alias("x")
            .join(bands.alias("y"), ["band_id", "band_hash"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .groupBy("band_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    for b in est:
        assert est[b] == true_per_band.get(b, 0), f"band {b}"


def test_simhash_wider_bits_cut_candidates(spark):
    """The candidate-law knob: 64-bit fingerprints (16-bit band keys)
    must produce strictly fewer band-collision candidates than 32-bit
    (8-bit keys, 256-bucket saturation) on a mostly-distinct corpus,
    while both remain supersets of the true near-dup pairs their own
    hamming verify keeps (losslessness is per-bits)."""
    from pyspark.sql import functions as F

    from binaryx_graph_spark.operators.dedup import simhash

    docs = spark.createDataFrame(
        [(i, f"document {i} body with unique content token{i * 17} and token{i * 31}")
         for i in range(300)],
        "doc_id long, text string",
    )

    def n_candidates(bits):
        w = bits // 4
        sigs = docs.select("doc_id", simhash(F.col("text"), bits).alias("sig"))
        band_arr = F.array(
            *[
                F.struct(F.lit(b).alias("band_id"), F.substring("sig", b * w + 1, w).alias("band_key"))
                for b in range(4)
            ]
        )
        bands = sigs.select("doc_id", F.explode(band_arr).alias("b")).select(
            "doc_id", "b.band_id", "b.band_key"
        )
        return (
            bands.alias("x")
            .join(bands.alias("y"), ["band_id", "band_key"])
            .filter(F.col("x.doc_id") < F.col("y.doc_id"))
            .select("x.doc_id", "y.doc_id")
            .distinct()
            .count()
        )

    c32, c64 = n_candidates(32), n_candidates(64)
    assert c64 < c32, f"64-bit keys must collide less: {c64} vs {c32}"
