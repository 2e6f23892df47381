"""Batch-perceptron classifier training: learns a separable corpus to
100% train accuracy, and the training run is deterministic (the gate
pins the bit-exact DuckDB replay; here we pin behavior)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.operators.textstats import (
    _tok_bucket,
    classifier_train,
    tokens,
)

POS_VOCAB = ["clean", "prose", "grammar", "article", "paragraph"]
NEG_VOCAB = ["zzspam", "qqjunk", "xxnoise", "kkgarbage", "vvboiler"]


def _corpus(spark):
    rows = []
    for i in range(40):
        vocab = POS_VOCAB if i % 2 == 0 else NEG_VOCAB
        words = [vocab[(i + j) % len(vocab)] for j in range(12)]
        rows.append((i, " ".join(words), "en" if i % 2 == 0 else "xx"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _accuracy(docs, weights) -> float:
    wdf = weights.select("bucket", F.col("w_final").alias("w"))
    scored = (
        docs.select(
            "doc_id",
            F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
        .select("doc_id", "y", _tok_bucket(F.col("tok")).alias("bucket"))
        .join(F.broadcast(wdf), "bucket")
        .groupBy("doc_id", "y")
        .agg(F.sum("w").alias("s"))
    )
    n = scored.count()
    return scored.filter(F.col("y") * F.col("s") > 0).count() / n


def test_separable_corpus_trains_to_perfect_accuracy(spark):
    docs = _corpus(spark)
    w = classifier_train(docs, "doc_id", "text", label_col="lang", pos_label="en")
    assert _accuracy(docs, w) == 1.0


def test_training_is_deterministic(spark):
    docs = _corpus(spark)
    a = classifier_train(docs, "doc_id", "text").collect()
    b = classifier_train(docs, "doc_id", "text").collect()
    assert a == b
    assert len(a) == 256


def test_eval_confusion_on_separable_corpus(spark):
    from binaryx_graph_spark.operators.textstats import classifier_eval

    docs = _corpus(spark)
    (row,) = classifier_eval(docs, "doc_id", "text").collect()
    assert row.n_docs == 40
    assert row.tp == 20 and row.tn == 20 and row.fp == 0 and row.fn == 0
    assert row.tp + row.fp + row.tn + row.fn == row.n_docs
