"""Leakage-safe split: no near-dup pair straddles train/test."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.model import load_table
from binaryx_graph_spark.operators.dedup import leakage_safe_split, minhash_near_dup

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_no_pair_straddles_the_split(spark):
    docs = load_table(spark, SF, "documents")
    pairs = minhash_near_dup(docs, "doc_id", "text", n=3, threshold=0.3)
    split = leakage_safe_split(docs, pairs)
    sa = split.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = split.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    leaked = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .count()
    )
    assert leaked == 0 and pairs.count() > 0
    # every document got exactly one side; both sides non-empty
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "test"}
    assert split.count() == docs.count()
