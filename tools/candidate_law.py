"""Candidate-volume scaling law for the banded dedup families (r7
verdict #4): the cost center of minhash-LSH and simhash near-dup is the
CANDIDATE SET, not the join — addendum 37 measured simhash emitting
244,849 pairs in 85 s at sf0.1.  This probe measures how the candidate
count grows with corpus size and fits the exponent.

Corpus sizing: the testdata documents table has only two distinct
sizes across SFs (500 / 500 / 5000), so the law is fitted over NESTED
doc_id-prefixes of the LARGEST corpus — four points from one text
distribution (halving prefixes), which is what a growth exponent needs;
cross-SF points would confound size with distribution.  Per prefix,
per family:
- n_docs, distinct candidate pairs (the real join), wall seconds
- the per-band EXACT pair estimate from bucket sizes
  (``estimate_band_candidates`` — one aggregation, no pair join), which
  prices every band BEFORE paying for any: the pre-flight for the
  band-count knob.

Fitted law: alpha in pairs ≈ k · n_docs^alpha (log-log slope between
consecutive SFs and overall).  alpha ≈ 1 → candidates scale with the
corpus (banding is doing its job); alpha → 2 names the family whose
band width must grow with scale.

Knob guidance this probe documents (SCALE.md addendum):
- simhash: bands is already at the LOSSLESS minimum (bands =
  max_hamming + 1); fewer bands breaks the pigeonhole guarantee, more
  bands only adds candidates.  The lever at fixed recall is ``bits``
  (wider fingerprints → fewer same-band collisions).
- minhash-LSH: bands/rows set the threshold curve t ≈ (1/b)^(1/r);
  dropping bands cuts candidates but RAISES the effective threshold —
  tune against the estimator, never by re-running the join.

Usage: python tools/candidate_law.py [sf_dir]   (default sf0.1)
Prints one JSON line + a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.model import load_table  # noqa: E402
from binaryx_graph_spark.operators.dedup import (  # noqa: E402
    SIMHASH_BITS,
    estimate_band_candidates,
    lsh_bands,
    minhash_signatures,
    simhash,
)
from binaryx_graph_spark.session import get_spark  # noqa: E402

FRACTIONS = (8, 4, 2, 1)  # nested prefixes: n_docs / f


def _pairs(bands_df) -> int:
    return (
        bands_df.alias("x")
        .join(bands_df.alias("y"), [c for c in ("band_id", "band_hash", "band_key") if c in bands_df.columns])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id"), F.col("y.doc_id"))
        .distinct()
        .count()
    )


def measure(docs, label: str) -> dict:
    n_docs = docs.count()
    out = {"corpus": label, "n_docs": n_docs}

    # minhash-LSH: 4 bands x 3 rows over 3-shingles
    t0 = time.monotonic()
    mh_bands = lsh_bands(minhash_signatures(docs, "doc_id", "text")).localCheckpoint(eager=True)
    est = {
        int(r["band_id"]): int(r["n_pairs"])
        for r in estimate_band_candidates(mh_bands).collect()
    }
    n_pairs = _pairs(mh_bands)
    out["minhash"] = {
        "pairs": n_pairs,
        "per_band_estimate": est,
        "estimate_total": sum(est.values()),
        "sec": round(time.monotonic() - t0, 2),
    }

    # simhash: 4 bands over 64-bit fingerprints (lossless for hamming<=3)
    t0 = time.monotonic()
    w = SIMHASH_BITS // 4
    sigs = docs.select(
        "doc_id", simhash(F.col("text"), SIMHASH_BITS).alias("sig")
    ).localCheckpoint(eager=True)
    band_arr = F.array(
        *[
            F.struct(F.lit(b).alias("band_id"), F.substring("sig", b * w + 1, w).alias("band_key"))
            for b in range(4)
        ]
    )
    sh_bands = sigs.select("doc_id", F.explode(band_arr).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    ).localCheckpoint(eager=True)
    est = {
        int(r["band_id"]): int(r["n_pairs"])
        for r in estimate_band_candidates(sh_bands).collect()
    }
    n_pairs = _pairs(sh_bands)
    out["simhash"] = {
        "pairs": n_pairs,
        "per_band_estimate": est,
        "estimate_total": sum(est.values()),
        "sec": round(time.monotonic() - t0, 2),
    }

    # the KNOB: 64-bit fingerprints → 16-bit band keys (65,536 buckets
    # per band instead of 256) — same lossless hamming<=3 guarantee,
    # band-key space now scales past the corpus
    t0 = time.monotonic()
    w64 = 64 // 4
    sigs64 = docs.select(
        "doc_id", simhash(F.col("text"), 64).alias("sig")
    ).localCheckpoint(eager=True)
    band_arr64 = F.array(
        *[
            F.struct(F.lit(b).alias("band_id"), F.substring("sig", b * w64 + 1, w64).alias("band_key"))
            for b in range(4)
        ]
    )
    sh64 = sigs64.select("doc_id", F.explode(band_arr64).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    ).localCheckpoint(eager=True)
    est64 = {
        int(r["band_id"]): int(r["n_pairs"])
        for r in estimate_band_candidates(sh64).collect()
    }
    out["simhash64"] = {
        "pairs": _pairs(sh64),
        "per_band_estimate": est64,
        "estimate_total": sum(est64.values()),
        "sec": round(time.monotonic() - t0, 2),
    }
    return out


def fit(rows: list[dict], family: str) -> dict:
    pts = [(r["n_docs"], r[family]["pairs"]) for r in rows if r[family]["pairs"] > 0]
    segs = [
        round(math.log(p2 / p1) / math.log(n2 / n1), 3)
        for (n1, p1), (n2, p2) in zip(pts, pts[1:])
    ]
    overall = (
        round(math.log(pts[-1][1] / pts[0][1]) / math.log(pts[-1][0] / pts[0][0]), 3)
        if len(pts) >= 2
        else None
    )
    return {"segment_alphas": segs, "overall_alpha": overall}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    full = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    total = full.count()
    rows = []
    for f in FRACTIONS:
        n = total // f
        sub = full.sort("doc_id").limit(n).repartition(32).localCheckpoint(eager=True)
        rows.append(measure(sub, f"{os.path.basename(sf_dir)}[:{n}]"))
    laws = {fam: fit(rows, fam) for fam in ("minhash", "simhash", "simhash64")}
    print(json.dumps({"rows": rows, "laws": laws}))
    hdr = "| corpus | n_docs | minhash pairs | simhash32 pairs | simhash64 pairs |"
    print(hdr + "\n|" + "---|" * 5, file=sys.stderr)
    for r in rows:
        print(
            f"| {r['corpus']} | {r['n_docs']} "
            f"| {r['minhash']['pairs']} | {r['simhash']['pairs']} "
            f"| {r['simhash64']['pairs']} |",
            file=sys.stderr,
        )
    print(f"laws: {json.dumps(laws)}", file=sys.stderr)


if __name__ == "__main__":
    main()
