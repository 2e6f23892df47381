"""BPE merge-step pair counting: known frequencies, single-char words,
corpus weighting through the word dictionary."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import bpe_pair_counts


def test_bpe_pairs_known_counts(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ba x"), (2, "abc AB")], "doc_id bigint, text string"
    )
    # word counts (lowercased): ab=3, ba=1, x=1, abc=1
    # pairs: 'a b' from ab(3) + abc(1) = 4 over 2 words; 'b a' from ba(1);
    # 'b c' from abc(1); 'x' has no pair
    got = {
        r["pair"]: (r["pair_count"], r["n_words"])
        for r in bpe_pair_counts(docs).collect()
    }
    assert got == {"a b": (4, 2), "b a": (1, 1), "b c": (1, 1)}


def test_bpe_pairs_empty_and_short(spark):
    docs = spark.createDataFrame([(1, ""), (2, "a b c")], "doc_id bigint, text string")
    assert bpe_pair_counts(docs).count() == 0  # only 1-char words


def _ref_bpe(word_counts, n_merges):
    """Canonical BPE trainer reference (Sennrich et al.)."""
    seqs = {w: list(w) for w in word_counts}
    merges = []
    for step in range(1, n_merges + 1):
        counts = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_counts[w]
        if not counts:
            break
        # max count, lexicographic "a b" tie-break like the operator
        best = min(counts.items(), key=lambda kv: (-kv[1], " ".join(kv[0])))
        (a, b), c = best
        merges.append((step, f"{a} {b}", c))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return merges


def test_bpe_train_merges_matches_reference(spark):
    from binaryx_graph_spark.operators.textstats import bpe_train_merges

    wc = {"low": 3, "lower": 2, "newest": 5, "widest": 4}
    text = " ".join(w for w, c in wc.items() for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    got = [
        (r["step"], r["pair"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=4).orderBy("step").collect()
    ]
    assert got == _ref_bpe(wc, 4)


def test_bpe_train_merges_overlap_chains(spark):
    """Repeated-symbol chains exercise the fixpoint replace passes."""
    from binaryx_graph_spark.operators.textstats import bpe_train_merges

    docs = spark.createDataFrame(
        [(1, "aaaaaa aaaa aa b")], "doc_id bigint, text string"
    )
    wc = {"aaaaaa": 1, "aaaa": 1, "aa": 1, "b": 1}
    got = [
        (r["step"], r["pair"], r["pair_count"])
        for r in bpe_train_merges(docs, n_merges=3).orderBy("step").collect()
    ]
    assert got == _ref_bpe(wc, 3)


def _ref_apply(word_counts, merges):
    """Apply trained merges to each word; return word -> n_subwords."""
    seqs = {w: list(w) for w in word_counts}
    for _step, pair, _c in merges:
        a, b = pair.split(" ")
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    return {w: len(s) for w, s in seqs.items()}


def test_bpe_tokenize_stats_matches_reference(spark):
    from binaryx_graph_spark.operators.textstats import bpe_tokenize_stats

    wc = {"low": 3, "lower": 2, "newest": 5, "widest": 4}
    words = [w for w, c in wc.items() for _ in range(c)]
    # two docs with a deterministic split of the word stream
    d1, d2 = " ".join(words[:7]), " ".join(words[7:])
    docs = spark.createDataFrame([(1, d1), (2, d2)], "doc_id bigint, text string")
    merges = _ref_bpe(wc, 3)
    n_sub = _ref_apply(wc, merges)
    got = {r["doc_id"]: r for r in bpe_tokenize_stats(docs, n_merges=3).collect()}
    for doc_id, text in ((1, d1), (2, d2)):
        ws = text.split()
        assert got[doc_id]["n_words"] == len(ws)
        expect_sub = sum(n_sub[w] for w in ws)
        assert got[doc_id]["n_subwords"] == expect_sub
        assert got[doc_id]["spw_x10k"] == expect_sub * 10000 // len(ws)


def test_bpe_tokenize_stats_overlap_runs(spark):
    """Same-symbol runs: left-to-right greedy merge application."""
    from binaryx_graph_spark.operators.textstats import bpe_tokenize_stats

    docs = spark.createDataFrame([(1, "aaaaaa aaaa aa b")], "doc_id bigint, text string")
    wc = {"aaaaaa": 1, "aaaa": 1, "aa": 1, "b": 1}
    merges = _ref_bpe(wc, 2)
    n_sub = _ref_apply(wc, merges)
    r = bpe_tokenize_stats(docs, n_merges=2).head()
    assert r["n_words"] == 4
    assert r["n_subwords"] == sum(n_sub[w] for w in wc)
