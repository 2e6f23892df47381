"""Randomized-threshold losslessness fuzz for the prefix-filtered dedup
joins: the optimized operators must return EXACTLY the naive answer at
ANY caller threshold, not only the gate-pinned defaults — the claim the
exact-rational (containment) and cross-multiplied (Jaccard) candidate
tests exist to guarantee."""

from __future__ import annotations

import random
from fractions import Fraction

from binaryx_graph_spark.operators.dedup import (
    containment_pairs_prefix,
    jaccard_pairs,
    jaccard_pairs_prefix,
)

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa", "lam", "mu"]


def _corpus(rng: random.Random, n_docs: int = 16):
    docs = []
    for i in range(n_docs):
        words = [rng.choice(VOCAB) for _ in range(rng.randint(5, 30))]
        docs.append((i, " ".join(words)))
    # force a containment pair and an exact duplicate
    docs.append((n_docs, docs[0][1] + " " + docs[1][1]))
    docs.append((n_docs + 1, docs[2][1]))
    return docs


def _shingle_sets(docs, n=3):
    out = {}
    for i, text in docs:
        toks = text.split(" ")
        out[i] = {" ".join(toks[k : k + n]) for k in range(max(1, len(toks) - n + 1))}
    return out


def test_jaccard_prefix_equals_naive_at_random_thresholds(spark):
    rng = random.Random(99)
    docs = _corpus(rng)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.17, 0.33, rng.uniform(0.2, 0.45), 0.5, rng.uniform(0.55, 0.9), 0.98):
        fast = sorted(
            map(tuple, jaccard_pairs_prefix(df, "doc_id", "text", threshold=t).collect())
        )
        slow = sorted(map(tuple, jaccard_pairs(df, "doc_id", "text", threshold=t).collect()))
        assert fast == slow, f"threshold {t}"


def test_containment_prefix_equals_python_naive_at_random_thresholds(spark):
    rng = random.Random(7)
    docs = _corpus(rng)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sets = _shingle_sets(docs)
    for t in (0.4, rng.uniform(0.45, 0.7), 0.8, rng.uniform(0.85, 0.99)):
        frac = Fraction(t).limit_denominator(1_000_000)
        num, den = frac.numerator, frac.denominator
        want = sorted(
            (a, b, len(sets[a] & sets[b]), len(sets[a]), len(sets[b]))
            for a in sets
            for b in sets
            if a != b and len(sets[a] & sets[b]) * den >= len(sets[a]) * num
        )
        got = sorted(
            (r.doc_sub, r.doc_sup, r.n_common, r.n_sub, r.n_sup)
            for r in containment_pairs_prefix(df, "doc_id", "text", threshold=t).collect()
        )
        assert got == want, f"threshold {t}"
