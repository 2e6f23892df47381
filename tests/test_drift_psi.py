"""drift_psi differential fuzz: the distributed scorer vs a pure-Python
PSI reference, plus the batch/streaming equivalence contract."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from binaryx_graph_spark.operators.sketch import (
    PSI_SCALE,
    drift_psi,
    drift_psi_from_counts,
)


def _psi_reference(ref: list[int], cur: list[int], scale: int = PSI_SCALE) -> list[int]:
    """Pure-Python PSI with the operator's exact arithmetic order."""
    b = len(ref)
    rt, ct = sum(ref), sum(cur)
    out = []
    for r, c in zip(ref, cur):
        contrib = ((c + 1) / (ct + b) - (r + 1) / (rt + b)) * math.log2(
            ((c + 1) * (rt + b)) / ((r + 1) * (ct + b))
        )
        out.append(int(math.floor(contrib * scale + 0.5)))
    return out


def test_drift_psi_matches_python_reference_fuzz(spark):
    rng = random.Random(42)
    for trial in range(8):
        n_bins = rng.choice([4, 7, 10])
        ref = [rng.randint(0, 50) for _ in range(n_bins)]
        cur = [rng.randint(0, 50) for _ in range(n_bins)]
        rows = [(b, 0) for b, n in enumerate(ref) for _ in range(n)] + [
            (b, 1) for b, n in enumerate(cur) for _ in range(n)
        ]
        rng.shuffle(rows)
        if not rows:
            continue
        df = spark.createDataFrame(rows, "bin long, cur int")
        got = {
            r["bin"]: (r["ref_n"], r["cur_n"], r["psi_q_bits"])
            for r in drift_psi(df, "bin", "cur", n_bins=n_bins).collect()
        }
        want = _psi_reference(ref, cur)
        assert set(got) == set(range(n_bins))
        for b in range(n_bins):
            assert got[b] == (ref[b], cur[b], want[b]), f"trial {trial} bin {b}"


def test_counts_level_entry_spine_completes(spark):
    # sparse counts (missing bins) -> zero-filled spine, smoothed PSI
    counts = spark.createDataFrame(
        [(1, 10, 0), (3, 0, 10)], "bin long, ref_n long, cur_n long"
    )
    rows = {r["bin"]: r for r in drift_psi_from_counts(counts, n_bins=5).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    assert rows[0]["ref_n"] == 0 and rows[0]["cur_n"] == 0
    # PSI contributions are non-negative by construction (share delta
    # and log ratio always share a sign); the two moved-mass bins carry
    # the drift, the untouched bins quantize to ~0
    assert rows[1]["psi_q_bits"] > 0 and rows[3]["psi_q_bits"] > 0
    assert rows[0]["psi_q_bits"] == rows[2]["psi_q_bits"] == rows[4]["psi_q_bits"]
    want = _psi_reference([0, 10, 0, 0, 0], [0, 0, 0, 10, 0])
    assert [rows[b]["psi_q_bits"] for b in range(5)] == want


def test_out_of_range_bins_rejected_loudly(spark):
    # pre-r7 these were silently dropped from the spine AND the rt/ct
    # totals, skewing every surviving bin's percentage (ADVICE r6)
    import pytest

    for bad_bin in (-1, 5, 99):
        counts = spark.createDataFrame(
            [(1, 10, 0), (bad_bin, 3, 3)], "bin long, ref_n long, cur_n long"
        )
        with pytest.raises(ValueError, match="outside"):
            drift_psi_from_counts(counts, n_bins=5)


def test_negative_values_clamp_to_bin_zero(spark):
    # engine/oracle symmetry for negative inputs: Spark `div` truncates
    # toward zero while DuckDB `//` floors, so without the greatest(0, …)
    # clamp a negative cents value bins differently on the two sides.
    # The clamp sends ALL negatives to bin 0 under BOTH conventions.
    from binaryx_graph_spark.queries.analytics_ext import PSI_BIN_CENTS, PSI_BINS

    vals = [-1, -4_999, -5_000, -9_999, -50_000, 0, 4_999, 5_000, 999_999]
    df = spark.createDataFrame([(v,) for v in vals], "cents long")
    spark_bins = [
        r["bin"]
        for r in df.select(
            F.greatest(
                F.lit(0),
                F.least(F.lit(PSI_BINS - 1), F.expr(f"cents div {PSI_BIN_CENTS}")),
            ).alias("bin")
        ).collect()
    ]
    duck_bins = [max(0, min(PSI_BINS - 1, v // PSI_BIN_CENTS)) for v in vals]
    assert spark_bins == duck_bins
    assert all(0 <= b < PSI_BINS for b in spark_bins)


def test_streaming_equals_batch(spark):
    from binaryx_graph_spark.registry import load_all

    reg = load_all()
    sf_dir = "/root/testdata/sf0.001"
    batch = sorted(map(tuple, reg["events_drift_psi"].fn(spark, sf_dir).collect()))
    stats: dict = {}
    from binaryx_graph_spark.streaming.drift_stream import streaming_drift_psi

    stream = sorted(map(tuple, streaming_drift_psi(spark, sf_dir, stats=stats).collect()))
    assert stats["n_batches"] == 3
    assert stream == batch
