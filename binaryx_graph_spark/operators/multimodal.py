"""Multimodal-column plumbing (north-star surface): image/audio/video as
opaque ``binary`` columns with typed metadata, processed through
Arrow-batched ``mapInPandas`` — the shape a 100 TB media pipeline needs.

The container has no image/audio codecs, so the DECODE KERNEL for the
codec formats IS A DETERMINISTIC FAKE (clearly marked below): it derives
plausible metadata from a sha256 of the bytes. Everything around it —
schema, binary encoding, Arrow batch transfer, per-partition batching,
feature-vector output shape — is real and tested; swapping in PIL/ffmpeg
touches only the marked lines.

The UNCOMPRESSED path at the bottom (:func:`synthesize_pgm` /
:func:`decode_pgm`, :func:`synthesize_wav` / :func:`decode_wav`,
:func:`synthesize_y4m` / :func:`decode_y4m`) has NO fake anywhere —
one REAL format per modality: binary PGM images, RIFF PCM16 WAVE
audio, and YUV4MPEG2 video need no codec, so the decoders really parse
bytes (header tokens; chunk walk + LE int16; FRAME-marker walk) and the
kernels (pixel sum, nearest-neighbor resample, average-hash; sample
sum, energy, peak; per-frame plane sums) run on real data, each
gate-pinned against a pure-SQL replay of the synthesis
(multimodal_decode_{{pgm,wav,y4m}}_real).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_DIM = 8


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table: document text bytes as the opaque
    payload (binary column plumbing is identical for real media)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """=== DETERMINISTIC FAKE DECODE (no codecs in this container) ===
    Real impl: PIL.Image.open / soundfile / ffprobe on ``payload``.
    Fake: metadata from the payload's sha256 so tests are reproducible
    and the oracle can recompute it."""
    h = hashlib.sha256(payload).hexdigest()
    width = 1 + int(h[0:4], 16) % 2048
    height = 1 + int(h[4:8], 16) % 2048
    channels = 1 + int(h[8], 16) % 4
    return width, height, channels


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode over ``mapInPandas``: one pandas batch per
    partition slice, vectorized columns out — the real pipeline shape."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = [_fake_decode(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Deterministic feature vectors (FEATURE_DIM floats from the payload
    hash) via mapInPandas — stands in for a CLIP/audio embedding model;
    batch shape and array<float> output schema are the real contract."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf["media"]:
                h = hashlib.sha256(bytes(b)).digest()
                feats.append([h[i] / 255.0 for i in range(FEATURE_DIM)])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.mapInPandas(batches, schema)


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video payloads: split the byte stream into
    n equal 'frames' (real impl: ffmpeg keyframe extraction) — the
    explode/one-row-per-frame dataflow is the contract."""
    video = media.filter(F.col("mime").startswith("video/"))
    size = F.length("media")
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return (
        video.select(
            "media_id",
            F.explode(idx).alias("frame_no"),
            size.alias("_sz"),
            F.col("media"),
        )
        .select(
            "media_id",
            "frame_no",
            F.substring(
                F.col("media"),
                (F.col("frame_no") * (F.col("_sz") / n_frames).cast("int") + 1),
                (F.col("_sz") / n_frames).cast("int"),
            ).alias("frame_bytes"),
        )
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("resized", T.BinaryType(), True),
        T.StructField("n_bytes_out", T.LongType(), True),
    ]
)


def resize_media(media: DataFrame, *, width: int = 224, height: int = 224) -> DataFrame:
    """Resize kernel over mapInPandas. === DETERMINISTIC FAKE RESIZE ===
    (real impl: PIL `Image.resize((width, height))` on the decoded
    payload). The fake produces a payload of exactly width·height·3
    bytes by cycling the source bytes — deterministic, size-correct, so
    downstream batch-shape/size accounting is real."""
    target = width * height * 3

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for b in pdf["media"]:
                src = bytes(b) or b"\x00"
                reps = target // len(src) + 1
                out.append((src * reps)[:target])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized": out,
                    "n_bytes_out": [len(x) for x in out],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("h0", T.IntegerType(), True),
        T.StructField("h1", T.IntegerType(), True),
        T.StructField("h2", T.IntegerType(), True),
        T.StructField("h3", T.IntegerType(), True),
    ]
)


def perceptual_hash(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over the binary column, as four
    16-bit bands → (media_id, h0..h3).

    Real impl: resize the decoded image to 8×8 grayscale and threshold
    each pixel at the mean.  === DETERMINISTIC STAND-IN SAMPLER === (no
    codecs in this container): the '64 pixels' are 64 evenly-strided
    payload bytes, mean-thresholded exactly like aHash; swapping in PIL
    touches only the sampling lines — the Arrow batch path, the banded
    output shape, and every consumer are real.

    Four 16-bit bands instead of one u64 so (a) no signed-overflow games
    in either engine and (b) the near-dup join gets its LSH bands for
    free: hamming(x, y) ≤ 3 ⇒ at least one band equal (pigeonhole) —
    the candidate join is provably complete at that threshold.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hs: list[list[int]] = [[], [], [], []]
            for b in pdf["media"]:
                data = bytes(b) or b"\x00"
                n = len(data)
                samp = [data[(i * n) // 64] for i in range(64)]
                mean = sum(samp) // 64
                bits = [1 if s > mean else 0 for s in samp]
                for band in range(4):
                    v = 0
                    for j in range(16):
                        v = v * 2 + bits[band * 16 + j]
                    hs[band].append(v)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "h0": hs[0],
                    "h1": hs[1],
                    "h2": hs[2],
                    "h3": hs[3],
                }
            )

    return media.mapInPandas(batches, PHASH_SCHEMA)


def phash_near_dup(media: DataFrame, *, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs by perceptual hash →
    (media_a, media_b, hamming), hamming ≤ ``max_hamming``.

    One banded equi-join (explode the 4 bands, shuffle on (band, value))
    generates candidates; pigeonhole makes it COMPLETE for
    max_hamming ≤ 3, so this equals the quadratic all-pairs scan without
    ever running one — the multimodal twin of the SimHash banded join.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError("phash_near_dup: banded join is complete only for max_hamming <= 3")
    ph = perceptual_hash(media)
    bands = ph.select(
        "media_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), F.col(f"h{i}").alias("hv"))
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("media_id", F.col("b.band").alias("band"), F.col("b.hv").alias("hv"))
    a, bb = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(bb, (F.col("a.band") == F.col("b.band")) & (F.col("a.hv") == F.col("b.hv")))
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"), F.col("b.media_id").alias("media_b")
        )
        .distinct()
    )
    pa = ph.select(*[F.col(c).alias(f"a_{c}") for c in ph.columns])
    pb = ph.select(*[F.col(c).alias(f"b_{c}") for c in ph.columns])
    ham = sum(
        F.bit_count(F.col(f"a_h{i}").bitwiseXOR(F.col(f"b_h{i}"))) for i in range(4)
    )
    return (
        cand.join(pa, cand.media_a == pa.a_media_id)
        .join(pb, cand.media_b == pb.b_media_id)
        .select("media_a", "media_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("media_a", "media_b")
    )


# ------------------------------------------------- REAL uncompressed path
#
# PGM (binary P5) needs no codec — header + raw bytes — so unlike the
# marked fake kernels above, NOTHING on this path is a stand-in: the
# synthesizer emits valid image files, the decoder does real binary
# parsing, and the pixel kernels (sum, nearest-neighbor resample,
# average-hash) run on real pixel data.  The gate oracle recomputes the
# expected outputs from the synthesis definition in SQL, so a green row
# proves parse(synthesize(doc)) round-trips bit-for-bit AND the kernels.

PGM_AHASH_GRID = 8


def synthesize_pgm(docs: DataFrame) -> DataFrame:
    """Deterministic REAL image synthesis → (media_id, media binary):
    each document becomes a valid binary PGM — width/height 4..32 from
    the text's sha256, pixels the sha256(seed:block) byte stream."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode("utf-8")).hexdigest()
                w = 4 + int(seed[0:2], 16) % 29
                h = 4 + int(seed[2:4], 16) % 29
                n = w * h
                px = bytearray()
                b = 0
                while len(px) < n:
                    px.extend(hashlib.sha256(f"{seed}:{b}".encode()).digest())
                    b += 1
                ids.append(doc_id)
                blobs.append(b"P5\n%d %d\n255\n" % (w, h) + bytes(px[:n]))
            yield pd.DataFrame({"media_id": ids, "media": blobs})

    return docs.mapInPandas(batches, "media_id long, media binary")


def _pgm_stats(data: bytes) -> tuple:
    """Shared per-payload REAL parse + kernels for both decode lanes:
    whitespace-tokenized P5 header, raster bounds check, integer pixel
    sum, nearest-neighbor GRID×GRID resample, average-hash bits
    (GRID²·p > Σ samples — integer cross-multiply, no float mean).
    → (width, height, maxval, n_pixels, pixel_sum, ahash)."""
    g = PGM_AHASH_GRID
    if data[:2] != b"P5":
        raise ValueError("not a binary PGM payload")
    idx, tokens = 2, []
    while len(tokens) < 3:
        while data[idx : idx + 1].isspace():
            idx += 1
        start = idx
        # b"".isspace() is False, so an end-of-buffer check is required:
        # without it a truncated header (e.g. b"P5\n4 4\n255") spins the
        # token loop past the end forever instead of failing loudly
        while idx < len(data) and not data[idx : idx + 1].isspace():
            idx += 1
        if idx == start or idx >= len(data):
            raise ValueError("truncated PGM header")
        tokens.append(int(data[start:idx]))
    idx += 1  # the single whitespace byte before the raster
    w, h, maxval = tokens
    n = w * h
    px = data[idx : idx + n]
    if len(px) != n:
        raise ValueError(f"raster truncated: {len(px)} != {n}")
    samp = [px[((r * h) // g) * w + (c * w) // g] for r in range(g) for c in range(g)]
    ssum = sum(samp)
    bits = "".join("1" if len(samp) * p > ssum else "0" for p in samp)
    # exact integer pixel sum in C speed: uint8 -> int64, no float path
    psum = int(np.frombuffer(px, dtype=np.uint8).astype(np.int64).sum())
    return (w, h, maxval, n, psum, bits)


def decode_pgm(media: DataFrame) -> DataFrame:
    """REAL binary PGM decoder + pixel kernels, Arrow-batched:
    whitespace-tokenized header parse (magic / width / height / maxval,
    raw raster after exactly one whitespace byte), then integer pixel
    sum, nearest-neighbor GRID×GRID resample, and average-hash bits
    (GRID²·p > Σ samples — integer cross-multiply, no float mean).
    → (media_id, width, height, maxval, n_pixels, pixel_sum, ahash)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (mid,) + _pgm_stats(bytes(blob))
                for mid, blob in zip(pdf["media_id"], pdf["media"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "maxval",
                    "n_pixels", "pixel_sum", "ahash",
                ],
            )

    return media.mapInPandas(
        batches,
        "media_id long, width int, height int, maxval int, "
        "n_pixels long, pixel_sum long, ahash string",
    )


def synthesize_wav(docs: DataFrame) -> DataFrame:
    """Deterministic REAL audio synthesis → (media_id, media binary):
    each document becomes a valid RIFF/WAVE file — mono PCM16, sample
    rate 8/16/24 kHz and sample count 64..256 from the text's sha256,
    samples the sha256(seed:block) byte stream as little-endian int16."""
    import struct

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode("utf-8")).hexdigest()
                n = 64 + int(seed[0:2], 16) % 193
                rate = 8000 * (1 + int(seed[2], 16) % 3)
                raw = bytearray()
                b = 0
                while len(raw) < 2 * n:
                    raw.extend(hashlib.sha256(f"{seed}:{b}".encode()).digest())
                    b += 1
                data = bytes(raw[: 2 * n])
                fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
                payload = (
                    b"RIFF"
                    + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                    + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(data)) + data
                )
                ids.append(doc_id)
                blobs.append(payload)
            yield pd.DataFrame({"media_id": ids, "media": blobs})

    return docs.mapInPandas(batches, "media_id long, media binary")


def _wav_stats(data: bytes) -> tuple:
    """Shared per-payload REAL RIFF/WAVE parse + kernels for both
    Python-boundary lanes: magic validation, chunk-list walk (fmt then
    data, even-byte padding), PCM16 LE sample unpack, then integer
    kernels — sample sum, energy (Σv²), peak |amplitude|.
    → (sample_rate, n_samples, sum_samples, sum_squares, peak_abs)."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    idx, rate, samples = 12, None, None
    while idx + 8 <= len(data):
        tag = data[idx : idx + 4]
        (size,) = struct.unpack_from("<I", data, idx + 4)
        body = data[idx + 8 : idx + 8 + size]
        if tag == b"fmt ":
            afmt, nch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if (afmt, nch, bits) != (1, 1, 16):
                raise ValueError("expected mono PCM16")
        elif tag == b"data":
            # a declared size past the actual bytes is a truncated
            # payload — raise (not silently decode fewer samples), the
            # same loud boundary the PGM/Y4M parsers keep
            if len(body) != size or size % 2:
                raise ValueError("truncated data chunk")
            samples = np.frombuffer(body, dtype="<i2")
        idx += 8 + size + (size & 1)  # RIFF chunks pad to even
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    # exact int64 kernels in C speed (v in [-2^15, 2^15): sums and
    # sums-of-squares stay well inside int64 for any realistic clip)
    s64 = samples.astype(np.int64)
    return (
        rate,
        int(samples.size),
        int(s64.sum()),
        int((s64 * s64).sum()),
        int(np.abs(s64).max()),
    )


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL RIFF/WAVE decoder + sample kernels, Arrow-batched: validates
    the RIFF/WAVE magics, walks the chunk list (fmt then data), reads
    PCM16 little-endian samples, then integer kernels — sample sum,
    energy (sum of squares), peak |amplitude| — the loudness/clipping
    stats an audio curation pass filters on.
    → (media_id, sample_rate, n_samples, sum_samples, sum_squares,
    peak_abs)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (mid,) + _wav_stats(bytes(blob))
                for mid, blob in zip(pdf["media_id"], pdf["media"])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "sample_rate", "n_samples",
                    "sum_samples", "sum_squares", "peak_abs",
                ],
            )

    return media.mapInPandas(
        batches,
        "media_id long, sample_rate int, n_samples long, "
        "sum_samples long, sum_squares long, peak_abs int",
    )


def synthesize_y4m(docs: DataFrame) -> DataFrame:
    """Deterministic REAL video synthesis → (media_id, media binary):
    each document becomes a valid YUV4MPEG2 stream — mono plane, 4..16
    px dims and 2..5 frames from the text's sha256, frame f's pixels
    the sha256(seed:f:block) byte stream."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, blobs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                seed = hashlib.sha256(str(text).encode("utf-8")).hexdigest()
                w = 4 + int(seed[0:2], 16) % 13
                h = 4 + int(seed[2:4], 16) % 13
                nf = 2 + int(seed[4], 16) % 4
                out = bytearray(b"YUV4MPEG2 W%d H%d F25:1 Cmono\n" % (w, h))
                for f in range(nf):
                    px = bytearray()
                    b = 0
                    while len(px) < w * h:
                        px.extend(
                            hashlib.sha256(f"{seed}:{f}:{b}".encode()).digest()
                        )
                        b += 1
                    out += b"FRAME\n" + bytes(px[: w * h])
                ids.append(doc_id)
                blobs.append(bytes(out))
            yield pd.DataFrame({"media_id": ids, "media": blobs})

    return docs.mapInPandas(batches, "media_id long, media binary")


def _y4m_stats(data: bytes) -> tuple:
    """Shared per-payload REAL YUV4MPEG2 parse + kernel for both
    Python-boundary lanes: stream-header tokenization (magic + W/H/F/C
    parameters), FRAME-marker walk extracting each raw mono plane.
    → (width, height, [per-frame pixel sums])."""
    nl = data.index(b"\n")
    tokens = data[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    params = {t[:1]: t[1:] for t in tokens[1:]}
    w, h = int(params[b"W"]), int(params[b"H"])
    if params.get(b"C", b"mono") != b"mono":
        raise ValueError("expected mono plane")
    idx, frame_sums = nl + 1, []
    while idx < len(data):
        if data[idx : idx + 6] != b"FRAME\n":
            raise ValueError("frame marker missing")
        idx += 6
        plane = data[idx : idx + w * h]
        if len(plane) != w * h:
            raise ValueError("frame truncated")
        frame_sums.append(
            int(np.frombuffer(plane, dtype=np.uint8).astype(np.int64).sum())
        )
        idx += w * h
    return (w, h, frame_sums)


def decode_y4m(media: DataFrame) -> DataFrame:
    """REAL YUV4MPEG2 decoder + per-frame kernel, Arrow-batched: parses
    the stream header (magic + W/H/F/C parameter tokens), walks the
    FRAME markers extracting each raw plane — the real frame-sampling
    dataflow `sample_frames` stands in for on codec formats — and emits
    one row per frame with its integer pixel sum.
    → (media_id, width, height, n_frames, frame_no, frame_sum)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                w, h, frame_sums = _y4m_stats(bytes(blob))
                for f, fsum in enumerate(frame_sums):
                    rows.append((mid, w, h, len(frame_sums), f, fsum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "n_frames", "frame_no", "frame_sum",
                ],
            )

    return media.mapInPandas(
        batches,
        "media_id long, width int, height int, n_frames int, "
        "frame_no int, frame_sum long",
    )


def decode_pgm_arrow(media: DataFrame) -> DataFrame:
    """The ARROW-NATIVE lane for the real PGM decoder: ``mapInArrow``
    hands each partition slice as a ``pyarrow.RecordBatch`` — binary
    payloads stay Arrow buffers end-to-end, skipping the pandas
    object-dtype copy ``mapInPandas`` pays per blob (measured: 13-25%
    faster at 262 KB payloads, converging at ~300 B ones — the copy
    overhead scales with payload size, exactly the axis 100 TB media
    grows on; SCALE.md addendum 34).  Same
    parse + kernels (:func:`_pgm_stats`), same output contract, same
    oracle — the gate pins lane equivalence."""
    import pyarrow as pa

    out_fields = pa.schema(
        [
            ("media_id", pa.int64()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("maxval", pa.int32()),
            ("n_pixels", pa.int64()),
            ("pixel_sum", pa.int64()),
            ("ahash", pa.string()),
        ]
    )

    def batches(it):
        for rb in it:
            ids = rb.column(rb.schema.get_field_index("media_id"))
            blobs = rb.column(rb.schema.get_field_index("media"))
            stats = [_pgm_stats(blobs[i].as_py()) for i in range(rb.num_rows)]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([s[0] for s in stats], pa.int32()),
                    pa.array([s[1] for s in stats], pa.int32()),
                    pa.array([s[2] for s in stats], pa.int32()),
                    pa.array([s[3] for s in stats], pa.int64()),
                    pa.array([s[4] for s in stats], pa.int64()),
                    pa.array([s[5] for s in stats], pa.string()),
                ],
                schema=out_fields,
            )

    return media.mapInArrow(
        batches,
        "media_id long, width int, height int, maxval int, "
        "n_pixels long, pixel_sum long, ahash string",
    )


def decode_wav_arrow(media: DataFrame) -> DataFrame:
    """The ARROW-NATIVE lane for the real RIFF/WAVE decoder: same parse
    + kernels (:func:`_wav_stats`), same output contract, same oracle —
    binary payloads stay Arrow buffers end-to-end, skipping the pandas
    object-dtype per-blob copy (the copy cost scales with payload bytes,
    the axis 100 TB audio grows on; measured for this family in SCALE.md
    addendum 36).  The gate pins lane equivalence against
    multimodal_decode_wav_real's oracle."""
    import pyarrow as pa

    out_fields = pa.schema(
        [
            ("media_id", pa.int64()),
            ("sample_rate", pa.int32()),
            ("n_samples", pa.int64()),
            ("sum_samples", pa.int64()),
            ("sum_squares", pa.int64()),
            ("peak_abs", pa.int32()),
        ]
    )

    def batches(it):
        for rb in it:
            ids = rb.column(rb.schema.get_field_index("media_id"))
            blobs = rb.column(rb.schema.get_field_index("media"))
            stats = [_wav_stats(blobs[i].as_py()) for i in range(rb.num_rows)]
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array([s[0] for s in stats], pa.int32()),
                    pa.array([s[1] for s in stats], pa.int64()),
                    pa.array([s[2] for s in stats], pa.int64()),
                    pa.array([s[3] for s in stats], pa.int64()),
                    pa.array([s[4] for s in stats], pa.int32()),
                ],
                schema=out_fields,
            )

    return media.mapInArrow(
        batches,
        "media_id long, sample_rate int, n_samples long, "
        "sum_samples long, sum_squares long, peak_abs int",
    )


def decode_y4m_arrow(media: DataFrame) -> DataFrame:
    """The ARROW-NATIVE lane for the real YUV4MPEG2 decoder: same parse
    + kernel (:func:`_y4m_stats`), same one-row-PER-FRAME output
    contract (the RecordBatch fans out rows — Arrow lanes are not
    limited to 1:1 maps), same oracle as multimodal_decode_y4m_real."""
    import pyarrow as pa

    out_fields = pa.schema(
        [
            ("media_id", pa.int64()),
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("n_frames", pa.int32()),
            ("frame_no", pa.int32()),
            ("frame_sum", pa.int64()),
        ]
    )

    def batches(it):
        for rb in it:
            ids = rb.column(rb.schema.get_field_index("media_id"))
            blobs = rb.column(rb.schema.get_field_index("media"))
            rows = []
            for i in range(rb.num_rows):
                w, h, frame_sums = _y4m_stats(blobs[i].as_py())
                mid = ids[i].as_py()
                for f, fsum in enumerate(frame_sums):
                    rows.append((mid, w, h, len(frame_sums), f, fsum))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r[0] for r in rows], pa.int64()),
                    pa.array([r[1] for r in rows], pa.int32()),
                    pa.array([r[2] for r in rows], pa.int32()),
                    pa.array([r[3] for r in rows], pa.int32()),
                    pa.array([r[4] for r in rows], pa.int32()),
                    pa.array([r[5] for r in rows], pa.int64()),
                ],
                schema=out_fields,
            )

    return media.mapInArrow(
        batches,
        "media_id long, width int, height int, n_frames int, "
        "frame_no int, frame_sum long",
    )
