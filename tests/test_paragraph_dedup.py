"""Paragraph-level dedup edge cases: keep-first rule, reconstruction,
empty docs, tail blocks shorter than the block width."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.dedup import paragraph_blocks, paragraph_dedup

from pyspark.sql import functions as F


def test_paragraph_blocks_grid(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, ""), (3, "x")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["blocks"]
        for r in df.select(
            "doc_id", paragraph_blocks(F.col("text"), words=2).alias("blocks")
        ).collect()
    }
    assert got[1] == ["a b", "c d", "e"]  # tail block shorter than width
    assert got[2] == [""]  # empty text -> one empty block (split('',' ')=[''])
    assert got[3] == ["x"]


def test_paragraph_dedup_keeps_first_occurrence(spark):
    # blocks of 2 words; the block "dup dup" appears in docs 1 (idx 1),
    # 2 (idx 0) and twice in 3 -> survives only at (1, 1).
    df = spark.createDataFrame(
        [
            (1, "aa bb dup dup"),
            (2, "dup dup cc dd"),
            (3, "dup dup dup dup"),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["cleaned_text"])
        for r in paragraph_dedup(df, "doc_id", "text", words=2).collect()
    }
    assert got[1] == (2, 2, "aa bb dup dup")
    assert got[2] == (2, 1, "cc dd")
    assert got[3] == (2, 0, "")


def test_paragraph_dedup_within_doc_repeats(spark):
    # repeats INSIDE one document also collapse to the first position
    df = spark.createDataFrame([(7, "x y x y x y")], "doc_id bigint, text string")
    (row,) = paragraph_dedup(df, "doc_id", "text", words=2).collect()
    assert (row["n_paras"], row["n_kept"], row["cleaned_text"]) == (3, 1, "x y")


def test_paragraph_dedup_preserves_order(spark):
    # surviving paragraphs are rejoined in original position order
    df = spark.createDataFrame(
        [(1, "k1 k1 zz zz"), (2, "aa aa k1 k1 bb bb")],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["cleaned_text"]
        for r in paragraph_dedup(df, "doc_id", "text", words=2).collect()
    }
    assert got[1] == "k1 k1 zz zz"
    assert got[2] == "aa aa bb bb"  # middle block removed, order intact


def _ref_paragraph_dedup(rows, words):
    """Pure-Python reference of the keep-first contract."""
    paras = []  # (doc_id, idx, para)
    for doc_id, text in rows:
        toks = text.split(" ")
        blocks = [
            " ".join(toks[i * words : i * words + words])
            for i in range((len(toks) + words - 1) // words)
        ] or [""]
        # split('', ' ') == [''] in both engines -> empty text = one block
        if text == "":
            blocks = [""]
        for idx, p in enumerate(blocks):
            paras.append((doc_id, idx, p))
    first = {}
    for doc_id, idx, p in sorted(paras):
        first.setdefault(p, (doc_id, idx))
    out = {}
    for doc_id, text in rows:
        mine = [(i, p) for d, i, p in paras if d == doc_id]
        kept = [p for i, p in mine if first[p] == (doc_id, i)]
        out[doc_id] = (len(mine), len(kept), " ".join(kept))
    return out


def test_paragraph_dedup_matches_reference_random(spark):
    """Differential check on randomized corpora (fixed seed): block
    grids, cross/within-doc repeats, empty docs, ragged tails."""
    import random

    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd"]
    for trial in range(5):
        rows = [
            (doc_id, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 9))))
            for doc_id in range(8)
        ]
        # randint(0,9)==0 -> "" empty doc possible via join of zero words
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        got = {
            r["doc_id"]: (r["n_paras"], r["n_kept"], r["cleaned_text"])
            for r in paragraph_dedup(df, "doc_id", "text", words=2).collect()
        }
        assert got == _ref_paragraph_dedup(rows, 2), f"trial {trial}: {rows}"


def test_containment_finds_doc_in_doc(spark):
    """The case Jaccard misses: a small doc embedded verbatim in a much
    larger one — containment ~1 while Jaccard is far below 0.5."""
    from binaryx_graph_spark.operators.dedup import (
        containment_pairs_prefix,
        jaccard_pairs_prefix,
    )

    small = "unique alpha beta gamma delta epsilon zeta phrase " * 3
    filler = " ".join(f"filler{i} distinct{i} chunk{i} body{i}" for i in range(60))
    big = filler + " " + small
    other = "nothing shared with anything else at all here truly " * 10
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string"
    )
    cont = {
        (r.doc_sub, r.doc_sup): r.containment
        for r in containment_pairs_prefix(docs, "doc_id", "text", threshold=0.8).collect()
    }
    assert (1, 2) in cont and cont[(1, 2)] >= 0.95
    assert (2, 1) not in cont  # big is NOT contained in small
    jac = jaccard_pairs_prefix(docs, "doc_id", "text", threshold=0.5).collect()
    assert all({r.doc_a, r.doc_b} != {1, 2} for r in jac)  # jaccard misses it


def test_containment_prefix_filter_lossless_random(spark):
    """Filter-losslessness on a seeded random corpus with planted
    containments: the prefix-filtered join must equal the naive
    all-directed-pairs join exactly (mirrors the DuckDB gate, but over
    adversarial mixtures the testdata doesn't contain)."""
    import random

    from pyspark.sql import functions as F

    from binaryx_graph_spark.operators.dedup import (
        containment_pairs_prefix,
        shingles,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(24):
        body = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 40)))
        rows.append((i, body))
    # plant: doc 100+i = doc i's text embedded in extra filler
    for i in range(6):
        extra = " ".join(rng.choice(vocab) for _ in range(10))
        rows.append((100 + i, rows[i][1] + " " + extra))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.doc_sub, r.doc_sup, r.n_common, r.n_sub, r.n_sup)
        for r in containment_pairs_prefix(docs, "doc_id", "text", threshold=0.8).collect()
    }
    sh = docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_sub"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_sup"), "sh")
    naive = (
        a.join(b, "sh")
        .filter(F.col("doc_sub") != F.col("doc_sup"))
        .groupBy("doc_sub", "doc_sup")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(sizes.select(F.col("doc_id").alias("doc_sub"), F.col("n_sh").alias("n_sub")), "doc_sub")
        .join(sizes.select(F.col("doc_id").alias("doc_sup"), F.col("n_sh").alias("n_sup")), "doc_sup")
        .filter(F.col("n_common") * 5 >= F.col("n_sub") * 4)
    )
    want = {
        (r.doc_sub, r.doc_sup, r.n_common, r.n_sub, r.n_sup) for r in naive.collect()
    }
    assert got == want
    assert any(s == i and p == 100 + i for (s, p, *_q) in got for i in range(6))


def test_containment_nondefault_thresholds_lossless(spark):
    """Regression for the r3 advice: candidates AND verification must use
    the caller's threshold as one exact rational — for every t, the
    prefix-filtered join equals a naive all-directed-pairs join verified
    with the same integer cross-multiplication."""
    import random
    from fractions import Fraction

    from pyspark.sql import functions as F

    from binaryx_graph_spark.operators.dedup import (
        containment_pairs_prefix,
        shingles,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(20):
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 35)))))
    for i in range(5):  # planted partial containments at varying overlap
        keep = rows[i][1].split()
        cut = keep[: max(4, int(len(keep) * (0.55 + 0.1 * i)))]
        extra = " ".join(rng.choice(vocab) for _ in range(12))
        rows.append((100 + i, " ".join(cut) + " " + extra))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sh = docs.select(
        F.col("doc_id"), F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("sh")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_sub"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_sup"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_sub") != F.col("doc_sup"))
        .groupBy("doc_sub", "doc_sup")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .join(sizes.select(F.col("doc_id").alias("doc_sub"), F.col("n_sh").alias("n_sub")), "doc_sub")
        .join(sizes.select(F.col("doc_id").alias("doc_sup"), F.col("n_sh").alias("n_sup")), "doc_sup")
        .localCheckpoint(eager=True)
    )
    for t in (0.5, 0.6, 0.75, 0.9):
        frac = Fraction(t).limit_denominator(1_000_000)
        got = {
            (r.doc_sub, r.doc_sup, r.n_common)
            for r in containment_pairs_prefix(docs, "doc_id", "text", threshold=t).collect()
        }
        want = {
            (r.doc_sub, r.doc_sup, r.n_common)
            for r in inter.filter(
                F.col("n_common") * frac.denominator >= F.col("n_sub") * frac.numerator
            ).collect()
        }
        assert got == want, f"threshold {t}: {got ^ want}"
    # sanity: lower thresholds admit strictly more planted pairs
    n_05 = len(containment_pairs_prefix(docs, "doc_id", "text", threshold=0.5).collect())
    n_09 = len(containment_pairs_prefix(docs, "doc_id", "text", threshold=0.9).collect())
    assert n_05 > n_09
