"""SimHash band-key sizing rule + candidate-budget pre-flight
(SCALE.md addendum 40 made executable: bits ≈ bands·(⌈log₂n⌉+4))."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.dedup import simhash_bits_for, simhash_preflight


def test_bits_for_pins_the_rule():
    # bands·(ceil(log2 n) + 4), multiple of bands
    assert simhash_bits_for(1000, 4) == 4 * (10 + 4)        # 56
    assert simhash_bits_for(10**6, 4) == 4 * (20 + 4)       # 96
    assert simhash_bits_for(10**10, 4) == 4 * (34 + 4)      # 152: the 10^10-doc corpus
    assert simhash_bits_for(256, 8) == 8 * (8 + 4)          # 96
    # exact powers of two: ceil(log2(1024)) == 10
    assert simhash_bits_for(1024, 4) == 4 * (10 + 4)
    # degenerate corpus sizes never go below one slack key per band
    assert simhash_bits_for(1, 4) == 16
    assert simhash_bits_for(0, 4) == 16
    # the cap is respected and stays a bands multiple
    assert simhash_bits_for(2**600, 4) == 512
    assert simhash_bits_for(2**600, 6, max_bits=512) % 6 == 0
    # every output is band-sliceable
    for n in (1, 7, 100, 10**8):
        for bands in (2, 4, 8):
            assert simhash_bits_for(n, bands) % bands == 0


def test_preflight_prices_saturation(spark):
    """On a 240-doc corpus of near-unique texts: the rule-chosen width
    keeps candidates within a linear budget, while a deliberately
    saturated width (2-bit band keys -> 4 buckets/band) explodes
    quadratically — the exact regime the pre-flight exists to catch."""
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(8))) for i in range(240)
    ]  # fully distinct token sets: collisions can only come from key saturation
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    auto = simhash_preflight(docs, "doc_id", "text", bands=4)
    assert auto["n_docs"] == 240
    assert auto["bits"] == simhash_bits_for(240, 4) == 4 * (8 + 4)
    assert auto["within_budget"], auto

    saturated = simhash_preflight(docs, "doc_id", "text", bands=4, bits=8)
    # 2-bit keys: <=4 buckets per band over 240 docs -> >= C(60,2)*4 pairs
    assert saturated["candidate_pairs"] > 4 * (60 * 59) // 2
    assert not saturated["within_budget"]
    # the pricer itself never materializes pairs: budget is the verdict
    assert saturated["budget_pairs"] == 2400
