"""Hot-key stress for the dedup candidate joins (r7 verdict #6): the
LSH/PPJoin equi-joins have their own skew risk — a near-universal
shingle or band bucket puts one join key on a single reducer.

Control design (the addendum-38 lesson: node-set-identical pairs): two
corpora with IDENTICAL doc count, doc lengths, and per-doc shingle
counts.  Every doc is unique filler; in the SKEWED variant, 10% of docs
carry one fixed 3-token phrase ("the hot shingle", exactly one shared
3-gram per carrier — its boundary shingles stay unique); in the CONTROL
the phrase slot is filled by per-doc unique tokens.  Any wall-time or
bucket-size delta is the hot key itself, not data volume.

Per operator, skewed vs control, interleaved in one session (ABBA,
min of 2):
- `jaccard_pairs_prefix` (PPJoin) — plus the STRUCTURAL check: how many
  prefix rows the hot shingle occupies (PPJoin orders prefixes by
  ascending document frequency, so a 10%-df shingle should essentially
  never enter a prefix — the hot key is absorbed by the algorithm, not
  by AQE)
- `minhash_near_dup` — plus max band-bucket size (a single shared
  shingle must NOT dominate min-hash bands: P ≈ (1/|set|)^rows per band)
- `simhash_near_dup` — plus max band-bucket size

Usage: python tools/stress_skew_dedup.py [n_docs]   (default 4000)
Prints one JSON line + a markdown table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from binaryx_graph_spark.operators.dedup import (  # noqa: E402
    SIMHASH_BITS,
    estimate_band_candidates,
    jaccard_pairs_prefix,
    lsh_bands,
    minhash_near_dup,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_dup,
)
from binaryx_graph_spark.session import get_spark  # noqa: E402

HOT = "alphaq betaq gammaq"  # one 3-gram shared by every carrier doc


def corpus(spark, n_docs: int, skewed: bool):
    """30 tokens per doc: 13 unique + a 3-token slot + 14 unique.  The
    slot is HOT for doc_id % 10 == 0 in the skewed variant, unique
    otherwise — same lengths, same shingle counts, either way."""
    rows = []
    for i in range(n_docs):
        pre = " ".join(f"u{i}x{j}" for j in range(13))
        post = " ".join(f"v{i}y{j}" for j in range(14))
        slot = HOT if (skewed and i % 10 == 0) else f"s{i}a s{i}b s{i}c"
        rows.append((i, f"{pre} {slot} {post}"))
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(32)


def _time(fn, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        best = min(best, time.monotonic() - t0)
    return round(best, 2)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    spark = get_spark()
    ctl = corpus(spark, n_docs, skewed=False).localCheckpoint(eager=True)
    skw = corpus(spark, n_docs, skewed=True).localCheckpoint(eager=True)

    ops = {
        "ppjoin": lambda d: jaccard_pairs_prefix(d, "doc_id", "text", threshold=0.5).count(),
        "minhash_lsh": lambda d: minhash_near_dup(d, "doc_id", "text", threshold=0.5).count(),
        "simhash": lambda d: simhash_near_dup(d, "doc_id", "text").count(),
    }
    out: dict = {"n_docs": n_docs, "hot_carriers": n_docs // 10, "ops": {}}
    for name, fn in ops.items():
        # ABBA interleave in one session; min of 2 per arm
        a1 = _time(lambda: fn(ctl), reps=1)
        b1 = _time(lambda: fn(skw), reps=1)
        b2 = _time(lambda: fn(skw), reps=1)
        a2 = _time(lambda: fn(ctl), reps=1)
        ctl_s, skw_s = min(a1, a2), min(b1, b2)
        out["ops"][name] = {
            "control_sec": ctl_s,
            "skewed_sec": skw_s,
            "ratio": round(skw_s / ctl_s, 3) if ctl_s else None,
        }

    # structural absorption checks on the skewed corpus
    sh = skw.select(
        "doc_id", F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("sh")
    )
    hot_df = sh.filter(F.col("sh") == HOT).count()
    # PPJoin prefix occupancy of the hot shingle: mirror the prefix
    # construction in jaccard_pairs_prefix (df-ascending order, first
    # floor((1-t)|set|)+1 shingles, t = 0.5)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    doc_arrays = (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_df", "sh"))), lambda s: s["sh"]
            ).alias("_shs")
        )
        .withColumn("n_sh", F.size("_shs").cast("long"))
    )
    hot_in_prefix = (
        doc_arrays.select(
            F.explode(
                F.slice("_shs", 1, (F.floor(0.5 * F.col("n_sh")) + 1).cast("int"))
            ).alias("sh")
        )
        .filter(F.col("sh") == HOT)
        .count()
    )
    out["hot_shingle_df"] = hot_df
    out["hot_in_ppjoin_prefix"] = hot_in_prefix

    for fam, bands_df in (
        ("minhash", lsh_bands(minhash_signatures(skw, "doc_id", "text"))),
        (
            "simhash",
            skw.select("doc_id", simhash(F.col("text"), SIMHASH_BITS).alias("sig"))
            .select(
                "doc_id",
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(b).alias("band_id"),
                                F.substring(
                                    "sig", b * (SIMHASH_BITS // 4) + 1, SIMHASH_BITS // 4
                                ).alias("band_key"),
                            )
                            for b in range(4)
                        ]
                    )
                ).alias("b"),
            )
            .select("doc_id", "b.band_id", "b.band_key"),
        ),
    ):
        key = "band_hash" if "band_hash" in bands_df.columns else "band_key"
        mx = (
            bands_df.groupBy("band_id", key)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("mx"))
            .collect()[0]["mx"]
        )
        est = estimate_band_candidates(bands_df).agg(F.sum("n_pairs")).collect()[0][0]
        out[f"{fam}_max_bucket"] = int(mx)
        out[f"{fam}_candidate_estimate"] = int(est)

    print(json.dumps(out))
    print("| op | control s | skewed s | ratio |", file=sys.stderr)
    print("|---|---|---|---|", file=sys.stderr)
    for name, r in out["ops"].items():
        print(
            f"| {name} | {r['control_sec']} | {r['skewed_sec']} | {r['ratio']} |",
            file=sys.stderr,
        )
    print(
        f"hot df={out['hot_shingle_df']}, hot-in-prefix={out['hot_in_ppjoin_prefix']}, "
        f"minhash max bucket={out['minhash_max_bucket']}, "
        f"simhash max bucket={out['simhash_max_bucket']}",
        file=sys.stderr,
    )
    ann = ann_arm()
    out["ann"] = ann
    print(json.dumps({"ann": ann}))
    print(f"ann: {json.dumps(ann)}", file=sys.stderr)



def ann_arm(n_vecs: int = 20000, dim: int = 16) -> dict:
    """ANN-family hot-bucket stress (same control discipline): N vectors
    of identical dim/cardinality; in the SKEWED variant 10% are drawn
    near ONE direction (every sign-LSH band bucket they hash to is the
    same → one 0.1N-member bucket per band, C(0.1N,2) candidates —
    which are also GENUINE near-neighbors, so extra wall is partly real
    verify work); the control is isotropic.  The metric that separates
    a straggler from real work is THROUGHPUT: candidates verified per
    second — a hot bucket that serializes one task collapses it."""
    import math

    from binaryx_graph_spark.operators.similarity import embedding_near_dup

    spark = get_spark()

    def vecs(skewed: bool):
        base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
        dims = []
        for d in range(dim):
            # deterministic pseudo-noise in [-1, 1): xxhash64 of (id, d)
            u = (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(d)), F.lit(20011)) / 10005.5) - 1.0
            if skewed:
                # 10% of vectors: one shared direction (+1 each dim) with
                # small noise -> identical sign pattern in every band
                hot = F.col("vec_id") % 10 == 0
                dims.append(F.when(hot, 1.0 + 0.05 * u).otherwise(u))
            else:
                dims.append(u)
        return base.select("vec_id", F.array(*dims).alias("embedding")).repartition(32)

    out = {}
    frames = {
        "control": vecs(False).localCheckpoint(eager=True),
        "skewed": vecs(True).localCheckpoint(eager=True),
    }
    for label in ("control", "skewed", "skewed", "control"):  # ABBA
        df = frames[label]
        t0 = time.monotonic()
        n_pairs = embedding_near_dup(df, threshold=0.95).count()
        sec = time.monotonic() - t0
        r = out.setdefault(label, {"sec": [], "pairs": n_pairs})
        r["sec"].append(round(sec, 2))
    for label, r in out.items():
        r["best_sec"] = min(r["sec"])
        # candidate volume ~ sum C(c,2) over band buckets; throughput =
        # verified candidates / sec (the straggler detector)
    exp_hot = math.comb(n_vecs // 10, 2)  # one hot bucket, deduped across bands
    ctl, skw = out["control"], out["skewed"]
    return {
        "n_vecs": n_vecs,
        "control_sec": ctl["best_sec"],
        "skewed_sec": skw["best_sec"],
        "wall_ratio": round(skw["best_sec"] / ctl["best_sec"], 3),
        "control_pairs": ctl["pairs"],
        "skewed_pairs": skw["pairs"],
        "hot_candidates_expected": exp_hot,
    }

if __name__ == "__main__":
    main()
