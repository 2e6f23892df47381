"""Perceptual-hash near-dup: the banded candidate join is COMPLETE for
hamming <= 3 (pigeonhole over 4 16-bit bands) — pinned against the
brute-force all-pairs scan on a corpus with constructed near-dups."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F

from binaryx_graph_spark.operators.multimodal import (
    media_from_documents,
    perceptual_hash,
    phash_near_dup,
)


def _docs(spark):
    base = "spark shuffle partition broadcast join window aggregate scan " * 4
    rows = [
        (1, base, "en"),
        (2, base, "en"),                      # exact dup of 1 → hamming 0
        (3, base.replace("scan", "sCan", 1), "en"),  # near dup (case flips bytes)
        (4, "completely different tokens entirely unrelated payload " * 5, "en"),
        (5, "another unrelated text body with its own byte histogram " * 5, "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dup_has_hamming_zero(spark):
    pairs = {
        (r.media_a, r.media_b): r.hamming
        for r in phash_near_dup(media_from_documents(_docs(spark))).collect()
    }
    assert pairs.get((1, 2)) == 0


def test_banded_join_equals_brute_force(spark):
    media = media_from_documents(_docs(spark))
    banded = {
        (r.media_a, r.media_b, r.hamming)
        for r in phash_near_dup(media, max_hamming=3).collect()
    }
    ph = perceptual_hash(media)
    a = ph.select(*[F.col(c).alias(f"a_{c}") for c in ph.columns])
    b = ph.select(*[F.col(c).alias(f"b_{c}") for c in ph.columns])
    ham = sum(
        F.bit_count(F.col(f"a_h{i}").bitwiseXOR(F.col(f"b_h{i}"))) for i in range(4)
    )
    brute = {
        (r.media_a, r.media_b, r.hamming)
        for r in (
            a.crossJoin(b)
            .filter(F.col("a_media_id") < F.col("b_media_id"))
            .select(
                F.col("a_media_id").alias("media_a"),
                F.col("b_media_id").alias("media_b"),
                ham.cast("long").alias("hamming"),
            )
            .filter(F.col("hamming") <= 3)
            .collect()
        )
    }
    assert banded == brute and (1, 2, 0) in brute


def test_threshold_beyond_band_guarantee_rejected(spark):
    with pytest.raises(ValueError):
        phash_near_dup(media_from_documents(_docs(spark)), max_hamming=4)


def test_pgm_real_roundtrip(spark):
    """decode_pgm does REAL binary parsing: a handcrafted 3x2 PGM with
    multi-digit dims and known pixels decodes to exact metadata, pixel
    sum, and average-hash computed by hand."""
    from binaryx_graph_spark.operators.multimodal import decode_pgm, synthesize_pgm

    payload = b"P5\n13 2\n255\n" + bytes(range(26))
    df = spark.createDataFrame([(7, payload)], "media_id long, media binary")
    row = decode_pgm(df).collect()[0]
    assert (row.width, row.height, row.maxval) == (13, 2, 255)
    assert row.n_pixels == 26 and row.pixel_sum == sum(range(26))
    # hand-check the 8x8 nearest resample + average hash
    px = list(range(26))
    samp = [px[((r * 2) // 8) * 13 + (c * 13) // 8] for r in range(8) for c in range(8)]
    want = "".join("1" if 64 * p > sum(samp) else "0" for p in samp)
    assert row.ahash == want

    # synthesize -> decode round-trips the synthesis parameters
    import hashlib

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = decode_pgm(synthesize_pgm(docs)).collect()[0]
    seed = hashlib.sha256(b"hello world").hexdigest()
    assert out.width == 4 + int(seed[0:2], 16) % 29
    assert out.height == 4 + int(seed[2:4], 16) % 29
    assert out.n_pixels == out.width * out.height


def test_wav_real_roundtrip(spark):
    """decode_wav really parses RIFF: a handcrafted file with known
    samples (including a padded odd-size leading LIST chunk) decodes to
    exact kernels; synthesize->decode round-trips the parameters."""
    import struct

    from binaryx_graph_spark.operators.multimodal import decode_wav, synthesize_wav

    samples = [0, 1000, -1000, 32767, -32768]
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    lst = b"odd"  # 3-byte chunk: exercises the even-padding walk
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(lst) + 1 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"LIST" + struct.pack("<I", len(lst)) + lst + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    df = spark.createDataFrame([(3, payload)], "media_id long, media binary")
    row = decode_wav(df).collect()[0]
    assert (row.sample_rate, row.n_samples) == (16000, 5)
    assert row.sum_samples == sum(samples)
    assert row.sum_squares == sum(v * v for v in samples)
    assert row.peak_abs == 32768

    import hashlib

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = decode_wav(synthesize_wav(docs)).collect()[0]
    seed = hashlib.sha256(b"hello world").hexdigest()
    assert out.n_samples == 64 + int(seed[0:2], 16) % 193
    assert out.sample_rate == 8000 * (1 + int(seed[2], 16) % 3)


def test_y4m_real_roundtrip(spark):
    """decode_y4m really walks FRAME markers: handcrafted 2-frame 3x2
    stream decodes to exact per-frame sums; synth->decode round-trips."""
    from binaryx_graph_spark.operators.multimodal import decode_y4m, synthesize_y4m

    f0, f1 = bytes(range(6)), bytes(range(10, 16))
    payload = b"YUV4MPEG2 W3 H2 F25:1 Cmono\n" + b"FRAME\n" + f0 + b"FRAME\n" + f1
    df = spark.createDataFrame([(9, payload)], "media_id long, media binary")
    rows = sorted(decode_y4m(df).collect(), key=lambda r: r.frame_no)
    assert [(r.width, r.height, r.n_frames) for r in rows] == [(3, 2, 2)] * 2
    assert [r.frame_sum for r in rows] == [sum(f0), sum(f1)]

    import hashlib

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    out = decode_y4m(synthesize_y4m(docs)).collect()
    seed = hashlib.sha256(b"hello world").hexdigest()
    assert len(out) == 2 + int(seed[4], 16) % 4
    assert out[0].width == 4 + int(seed[0:2], 16) % 13


def test_real_decoders_fail_loudly_on_malformed_payloads(spark):
    """The real parsers reject corrupt inputs instead of silently
    degrading (the engine-wide loud-failure contract)."""
    import pytest

    from binaryx_graph_spark.operators.multimodal import (
        decode_pgm,
        decode_wav,
        decode_y4m,
    )

    bad_pgm = spark.createDataFrame(
        [(1, b"P5\n4 4\n255\n" + bytes(7))], "media_id long, media binary"
    )  # raster truncated: 7 of 16 bytes
    with pytest.raises(Exception, match="truncated"):
        decode_pgm(bad_pgm).collect()

    # truncated header (no whitespace after maxval): before the r7 guard
    # this spun the tokenizer loop past end-of-buffer forever (ADVICE r6)
    for hdr in (b"P5\n4 4\n255", b"P5", b"P5\n", b"P5\n4 4\n"):
        bad_hdr = spark.createDataFrame(
            [(1, hdr)], "media_id long, media binary"
        )
        with pytest.raises(Exception, match="truncated"):
            decode_pgm(bad_hdr).collect()

    bad_wav = spark.createDataFrame(
        [(1, b"RIFX" + bytes(20))], "media_id long, media binary"
    )  # wrong magic
    with pytest.raises(Exception, match="RIFF"):
        decode_wav(bad_wav).collect()

    # data chunk declares more bytes than the payload carries: must
    # raise, not silently decode fewer samples (ADVICE r7)
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    trunc = (
        b"RIFF" + struct.pack("<I", 36 + 10) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 10) + bytes(6)  # declares 10, has 6
    )
    bad_trunc = spark.createDataFrame(
        [(1, trunc)], "media_id long, media binary"
    )
    with pytest.raises(Exception, match="truncated data chunk"):
        decode_wav(bad_trunc).collect()

    bad_y4m = spark.createDataFrame(
        [(1, b"YUV4MPEG2 W3 H2 F25:1 Cmono\nFRAM!" + bytes(6))],
        "media_id long, media binary",
    )  # corrupt frame marker
    with pytest.raises(Exception, match="marker"):
        decode_y4m(bad_y4m).collect()
