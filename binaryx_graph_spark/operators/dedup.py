"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash. (North-star surface; each has a
DuckDB twin for the correctness gate.)

Scale design (100 TB posture):
- exact dedup: one hash-groupBy — the cheapest possible shuffle (64-hex
  key), partial agg map-side
- Jaccard: shingle explode + self-join — pair blowup bounded by shingle
  selectivity (word n-grams, not unigrams); at real scale ALWAYS behind
  the MinHash/LSH prefilter
- MinHash/LSH: K signature mins in ONE aggregation pass (no K-way
  explode), banding → candidate pairs via band-equality join (shuffle on
  band hash), exact Jaccard verify only on candidates
- SimHash: B bit-sums in one pass, near-dup via banded hamming join

Hash functions are sha256-based so Spark and DuckDB agree bit-for-bit:
  minhash_k(doc)  = MIN over shingles of hex-slice k of sha256(shingle)
                    (12 slices of ONE digest — one hash eval per shingle)
  simhash bit b   = sign of Σ_tokens tf · (2·parity(hex digit b of
                    sha256(token)) - 1)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import SQL_TOKENS, shingles, spark_sql_shingles, sql_shingles, tokens

# ------------------------------------------------------------------- exact


def exact_dedup_groups(df: DataFrame, id_col: str, key: Column) -> DataFrame:
    """Group documents by a content hash; returns
    (content_hash, n_docs, canonical_id=min id)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), F.sha2(key, 256).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_id"))
    )


# ----------------------------------------------------------- n-gram Jaccard


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold →
    (doc_a, doc_b, n_common, n_a, n_b, jaccard), doc_a < doc_b.

    Exact: |A∩B| via shingle join, |A∪B| = |A|+|B|-|A∩B| — all integer
    counts, one final division (bit-identical to the SQL twin)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")


def sql_jaccard_pairs(table: str, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.5) -> str:
    sh = sql_shingles(text_col, n)
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc_id, u.sh AS sh
      FROM {table}, unnest(list_distinct({sh})) AS u(sh)
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
    """


# ------------------------------------------------------------- MinHash/LSH

N_HASHES = 12
N_BANDS = 4  # 3 rows per band


#: hex chars per signature slice: 12 slices × 5 chars = 60 of sha256's 64
SIG_SLICE = 5


def _sig_aggs() -> list[Column]:
    """sig_k = min over shingles of hex slice k of ONE sha256 digest —
    12 (approximately) independent 20-bit min-hashes for the price of a
    single hash evaluation per shingle (the digest is materialized in a
    projection BEFORE the groupBy so it is computed exactly once; 12
    sha256 calls per shingle was the measured hash-cost center). Slice
    collisions only nudge banding recall UP, and the exact-Jaccard
    verify keeps the output contract exact."""
    return [
        F.min(F.substring(F.col("_dg"), k * SIG_SLICE + 1, SIG_SLICE)).alias(f"sig_{k}")
        for k in range(N_HASHES)
    ]


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, *, n: int = 3) -> DataFrame:
    """K MinHash signature values per document, computed in ONE
    aggregation pass over the exploded shingles (no K-fold data blowup):
    sig_k = min(slice_k(sha256(shingle))). → (doc_id, sig_0 … sig_{K-1})"""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    ).withColumn("_dg", F.sha2(F.col("sh"), 256))
    return sh.groupBy("doc_id").agg(*_sig_aggs())


def lsh_bands(sigs: DataFrame) -> DataFrame:
    """Band hashes: band_b = sha256(sig_{3b} ‖ sig_{3b+1} ‖ sig_{3b+2}).
    → (doc_id, band_id, band_hash)"""
    rows_per_band = N_HASHES // N_BANDS
    bands = []
    for b in range(N_BANDS):
        cols = [F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            F.struct(F.lit(b).alias("band_id"), F.sha2(F.concat(*cols), 256).alias("band_hash"))
        )
    return sigs.select("doc_id", F.explode(F.array(*bands)).alias("band")).select(
        "doc_id", "band.band_id", "band.band_hash"
    )


def estimate_band_candidates(bands_df: DataFrame) -> DataFrame:
    """EXACT per-band candidate-pair counts WITHOUT materializing a
    single pair: a band bucket of c docs contributes C(c,2) pairs, so
    one groupBy over (band_id, band_hash/band_key) prices the whole
    candidate join — O(|bands_df|) where the join is O(Σ c²).  This is
    the pre-flight for the band-count knob (SCALE.md candidate-law
    addendum): the cumulative sum over band_id tells how many bands fit
    a target candidate budget BEFORE paying for any of them.  Upper
    bound on the distinct-pair count (a pair sharing k bands is counted
    k times here); exact per band.  → (band_id, n_buckets, n_pairs)."""
    key = "band_hash" if "band_hash" in bands_df.columns else "band_key"
    # c·(c-1) is always even: `div` keeps the whole pipeline in LONG
    # arithmetic (float `/` then cast would drift past 2^53 pairs — the
    # hot-bucket regime this estimator exists to price), matching the
    # SQL twin's integer `//`
    return (
        bands_df.groupBy("band_id", key)
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum(F.expr("(_c * (_c - 1)) div 2")).alias("n_pairs"),
        )
    )


def sql_band_candidate_estimate(table: str, id_col: str, text_col: str, *, n: int = 3) -> str:
    """DuckDB twin of ``estimate_band_candidates`` over the MinHash
    banding of ``table`` — keep in sync with :func:`lsh_bands`."""
    sh = sql_shingles(text_col, n)
    sig_cols = ",\n        ".join(
        f"min(substr(sha256(u.sh), {k * SIG_SLICE + 1}, {SIG_SLICE})) AS sig_{k}"
        for k in range(N_HASHES)
    )
    rows_per_band = N_HASHES // N_BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, sha256({concat}) AS band_hash FROM sigs".format(
            b=b,
            concat=" || ".join(f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc_id, u.sh AS sh
      FROM {table}, unnest(list_distinct({sh})) AS u(sh)
    ),
    sigs AS (SELECT doc_id, {sig_cols} FROM sh u GROUP BY doc_id),
    bands AS ({band_rows}),
    buckets AS (
      SELECT band_id, band_hash, count(*) AS c FROM bands GROUP BY band_id, band_hash
    )
    SELECT band_id,
           CAST(count(*) AS BIGINT) AS n_buckets,
           CAST(sum((c * (c - 1)) // 2) AS BIGINT) AS n_pairs
    FROM buckets GROUP BY band_id
    """


def minhash_near_dup(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Full MinHash→LSH→verify pipeline: candidate pairs share ≥1 band;
    ONLY candidates pay the exact-Jaccard verify join — the all-pairs
    shingle self-join never happens, which is the entire point of LSH
    at scale (all-pairs is O(Σ df(shingle)²); candidates are ~linear)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    sh = sh.localCheckpoint(eager=True)  # reused by sigs and verify

    sigs = sh.withColumn("_dg", F.sha2(F.col("sh"), 256)).groupBy("doc_id").agg(*_sig_aggs())
    # candidate self-join keys on xxhash64(band_id, band_hash): the
    # exchange ships one int64 per row instead of the 64-char sha256
    # string (guide §2.3 narrower types).  A 64-bit key collision can
    # only ADD a candidate pair, which the exact verify culls — output
    # provably unchanged.  lsh_bands itself keeps the sha256 band_hash:
    # it is the persisted index artifact's key and the band-estimate
    # query's oracle-replayed value.
    bands = lsh_bands(sigs).select("doc_id", F.xxhash64("band_id", "band_hash").alias("_bk"))
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), "_bk")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # verify on PER-DOC ARRAYS of xxhash64(shingle) — one row per doc —
    # exactly the jaccard_pairs_prefix verify shape: the old exploded
    # verify shuffled the shingle-cardinality table TWICE (once per
    # join key); the array verify shuffles the corpus-cardinality
    # arrays once and counts the intersection with array_intersect over
    # int64 (~3× cheaper than strings, measured there).  A 64-bit
    # collision between two DISTINCT shingles of one candidate pair
    # (P < 1e-12 corpus-wide) is the only way a value could move, and
    # the DuckDB gate computes the exact string join and would flag it.
    # No broadcast hint: AQE picks the build side from runtime stats.
    hashed = sh.groupBy("doc_id").agg(
        F.collect_list(F.xxhash64("sh")).alias("_hs"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    aa = hashed.select(
        F.col("doc_id").alias("doc_a"), F.col("_hs").alias("_ha"), F.col("n_sh").alias("n_a")
    )
    bb = hashed.select(
        F.col("doc_id").alias("doc_b"), F.col("_hs").alias("_hb"), F.col("n_sh").alias("n_b")
    )
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_ha", "_hb")).cast("long").alias("n_common"),
            "n_a",
            "n_b",
        )
        .withColumn(
            "jaccard",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


def minhash_band_index(
    docs: DataFrame, id_col: str, text_col: str, *, n: int = 3
) -> DataFrame:
    """The persisted dedup-index artifact: (doc_id, band_id, band_hash)
    for a corpus. In production this is written once per corpus snapshot
    (parquet partitioned/bucketed by band_hash) and every incoming batch
    joins against it — the corpus text is never re-shingled."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    ).withColumn("_dg", F.sha2(F.col("sh"), 256))
    return lsh_bands(sh.groupBy("doc_id").agg(*_sig_aggs()))


def incremental_minhash_near_dup(
    new_docs: DataFrame,
    corpus_docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.5,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental near-dup: MinHash/LSH pairs that TOUCH the new batch —
    (new, corpus) and (new, new) pairs only — without re-banding or
    re-verifying the existing corpus against itself.

    This is the steady-state shape of a production dedup pass: the
    corpus's band index (:func:`minhash_band_index`) is a precomputed
    artifact, each incoming batch is banded (O(batch), not O(corpus))
    and joined against index ∪ own-bands, and the exact-Jaccard verify
    touches only candidate members' shingles (semi-joined out of the
    corpus — the corpus is scanned once for the candidates' text, never
    self-joined).

    Output contract (pinned by tests and the gate oracle): identical to
    global :func:`minhash_near_dup` over ``new ∪ corpus`` restricted to
    pairs with at least one new member — banding false-negatives and
    all.
    """
    sh_new = new_docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    sh_new = sh_new.localCheckpoint(eager=True)
    bands_new = lsh_bands(
        sh_new.withColumn("_dg", F.sha2(F.col("sh"), 256)).groupBy("doc_id").agg(*_sig_aggs())
    )
    bands_new = bands_new.localCheckpoint(eager=True)
    if corpus_bands is None:
        corpus_bands = minhash_band_index(corpus_docs, id_col, text_col, n=n)
    bands_all = bands_new.unionByName(corpus_bands)
    cand = (
        bands_new.alias("x")
        .join(bands_all.alias("y"), ["band_id", "band_hash"])
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .select(
            F.least(F.col("x.doc_id"), F.col("y.doc_id")).alias("doc_a"),
            F.greatest(F.col("x.doc_id"), F.col("y.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    # candidate members' shingles only: new-batch shingles are in hand;
    # corpus shingles come from ONE semi-joined scan of the matched docs
    member_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_corpus_cand = corpus_docs.join(
        member_ids.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    ).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    sh = sh_new.unionByName(sh_corpus_cand)
    # per-doc hashed-array verify (see minhash_near_dup): one shuffle of
    # the candidate members' arrays instead of two shuffles of the
    # exploded shingle table; values identical barring a 64-bit xxhash
    # collision within one pair (P < 1e-12, gate-checked exactly)
    hashed = sh.groupBy("doc_id").agg(
        F.collect_list(F.xxhash64("sh")).alias("_hs"),
        F.count(F.lit(1)).alias("n_sh"),
    )
    aa = hashed.select(
        F.col("doc_id").alias("doc_a"), F.col("_hs").alias("_ha"), F.col("n_sh").alias("n_a")
    )
    bb = hashed.select(
        F.col("doc_id").alias("doc_b"), F.col("_hs").alias("_hb"), F.col("n_sh").alias("n_b")
    )
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_ha", "_hb")).cast("long").alias("n_common"),
            "n_a",
            "n_b",
        )
        .withColumn(
            "jaccard",
            (F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


def sql_minhash_near_dup(table: str, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.5) -> str:
    sh = sql_shingles(text_col, n)
    sig_cols = ",\n        ".join(
        f"min(substr(sha256(u.sh), {k * SIG_SLICE + 1}, {SIG_SLICE})) AS sig_{k}"
        for k in range(N_HASHES)
    )
    rows_per_band = N_HASHES // N_BANDS
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, sha256({concat}) AS band_hash FROM sigs".format(
            b=b,
            concat=" || ".join(f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for b in range(N_BANDS)
    )
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc_id, u.sh AS sh
      FROM {table}, unnest(list_distinct({sh})) AS u(sh)
    ),
    sigs AS (SELECT doc_id, {sig_cols} FROM sh u GROUP BY doc_id),
    bands AS ({band_rows}),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_hash = y.band_hash AND x.doc_id < y.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_a AS doc_a, i.doc_b AS doc_b, i.n_common AS n_common,
           sa.n_sh AS n_a, sb.n_sh AS n_b,
           CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common) AS jaccard
    FROM inter i
      JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
      JOIN sizes sa ON sa.doc_id = i.doc_a
      JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common) >= {threshold}
    """


# ----------------------------------------------------------------- SimHash

SIMHASH_BITS = 32
_HEXPOS = "0123456789abcdef"


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash as a '0'/'1' bitstring column (string avoids 64-bit
    unsigned pitfalls across engines). One expression per bit over the
    token multiset — a single projection, no shuffle.

    Bit b's ±1 contribution per token is the parity of hex digit b of
    sha256(token): Spark computes it via base conversion, DuckDB via
    strpos over the hex alphabet — same value (sha256 hex is lowercase
    in both engines)."""
    toks = tokens(col)
    # One pass, vector-valued fold. HOF lambdas are interpreted (no CSE
    # across or within lambda bodies), so the layering matters:
    #   1. hashes:   token → sha256            (1 hash per token, total)
    #   2. contribs: hash (a BOUND lambda var, not a recomputed expr)
    #      → array of ±1 per bit
    #   3. one aggregate folds the contrib vectors with element-wise add
    # B separate scalar folds would re-hash every token B times.
    hashes = F.transform(toks, lambda t: F.sha2(t, 256))

    def contrib_vec(h):
        return F.array(
            *[
                2 * (F.conv(F.substring(h, b, 1), 16, 10).cast("int") % 2) - 1
                for b in range(1, bits + 1)
            ]
        )

    contribs = F.transform(hashes, contrib_vec)
    zero = F.array_repeat(F.lit(0), bits)
    sums = F.aggregate(contribs, zero, lambda acc, c: F.zip_with(acc, c, lambda a, b: a + b))
    return F.array_join(
        F.transform(sums, lambda s: F.when(s > 0, F.lit("1")).otherwise(F.lit("0"))), ""
    )


def sql_simhash(col: str, bits: int = SIMHASH_BITS) -> str:
    toks = SQL_TOKENS.format(col=col)
    parts = []
    for b in range(1, bits + 1):
        contrib = (
            f"list_sum(list_transform({toks}, t -> "
            f"2 * ((strpos('{_HEXPOS}', substr(sha256(t), {b}, 1)) - 1) % 2) - 1))"
        )
        parts.append(f"CASE WHEN {contrib} > 0 THEN '1' ELSE '0' END")
    return " || ".join(parts)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length '0'/'1' bitstrings —
    an in-order integer fold, bit-identical to the SQL twin."""
    return F.aggregate(
        F.zip_with(
            F.split(a, ""), F.split(b, ""), lambda x, y: F.when(x != y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )


def sql_hamming(a: str, b: str, bits: int = SIMHASH_BITS) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, {bits + 1}), "
        f"i -> CASE WHEN substr({a}, i, 1) <> substr({b}, i, 1) THEN 1 ELSE 0 END)) AS BIGINT)"
    )


def simhash_near_dup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bits: int = SIMHASH_BITS,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs via a BANDED hamming join →
    (doc_a, doc_b, hamming ≤ max_hamming).

    Pigeonhole completeness: with ``bands`` equal slices, two signatures
    within ``bands - 1`` differing bits share at least one identical
    band, so the band-equality equi-join (shuffle on the band key, never
    all-pairs) is LOSSLESS for max_hamming ≤ bands-1 — the oracle is the
    naive all-pairs hamming join and the gate proves equality."""
    assert bits % bands == 0 and max_hamming <= bands - 1
    w = bits // bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"), simhash(F.col(text_col), bits).alias("sig")
    ).localCheckpoint(eager=True)  # signature pass reused by band + verify

    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.substring("sig", b * w + 1, w).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    bands_df = sigs.select("doc_id", F.explode(band_arr).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    cand = (
        bands_df.alias("x")
        .join(bands_df.alias("y"), ["band_id", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )
    # NOTE: sa/sb are corpus-sized (one sig per doc) — no broadcast hint;
    # AQE broadcasts the small candidate side instead when it fits
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming(F.col("_sa"), F.col("_sb")).cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_bits_for(
    n_docs: int, bands: int = 4, *, slack_bits: int = 4, max_bits: int = 512
) -> int:
    """Signature width that keeps the LSH band keys UNSATURATED at
    corpus size ``n_docs`` — SCALE.md addendum 40's sizing rule, made a
    function.  A band key of k bits has 2^k buckets; once n_docs ≫ 2^k
    the buckets saturate and the candidate join degrades to Θ(n²) by
    pigeonhole (the r8 root cause: 8-bit keys at corpus scale).  Keeping
    expected bucket occupancy O(1) needs k ≈ log₂(n_docs) + slack, so::

        bits = bands · (⌈log₂ n_docs⌉ + slack_bits)

    (bits ≈ bands·(log₂n+4) with the default slack).  Always a multiple
    of ``bands`` (the band slicer requires it), capped at ``max_bits``
    (rounded down to a bands multiple) — past ~512 bits the signature
    itself stops being the cheap part."""
    import math

    n = max(int(n_docs), 1)
    per_band = max(1, (n - 1).bit_length() + slack_bits) if n > 1 else slack_bits
    per_band = max(per_band, 1)
    cap = max(bands, (max_bits // bands) * bands)
    return min(bands * per_band, cap)


def simhash_preflight(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    bands: int = 4,
    bits: int | None = None,
    target_pairs_per_doc: float = 10.0,
) -> dict:
    """Price the banded SimHash join BEFORE paying for it — the
    deployment recipe wiring :func:`simhash_bits_for` (the width rule)
    into :func:`estimate_band_candidates` (the exact O(|bands|) pricer):

    1. ``bits`` defaults to ``simhash_bits_for(count(df), bands)``;
    2. signatures are banded exactly as :func:`simhash_near_dup` would;
    3. the estimator prices every band's candidate pairs WITHOUT
       materializing one pair;
    4. the verdict compares the total against
       ``target_pairs_per_doc × n_docs`` — the budget a linear-ish
       near-dup pass can afford.

    Returns ``{n_docs, bits, bands, candidate_pairs, budget_pairs,
    within_budget}``.  ``within_budget=False`` means: widen ``bits``
    (key saturation) or revisit the band count before running
    :func:`simhash_near_dup` at this scale."""
    n_docs = df.count()
    if bits is None:
        bits = simhash_bits_for(n_docs, bands)
    if bits % bands != 0:
        raise ValueError(f"bits={bits} must be a multiple of bands={bands}")
    w = bits // bands
    sigs = df.select(
        F.col(id_col).alias("doc_id"), simhash(F.col(text_col), bits).alias("sig")
    )
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.substring("sig", b * w + 1, w).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    bands_df = sigs.select("doc_id", F.explode(band_arr).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    total = (
        estimate_band_candidates(bands_df)
        .agg(F.sum("n_pairs").alias("t"))
        .collect()[0]["t"]
    ) or 0
    budget = int(target_pairs_per_doc * n_docs)
    return {
        "n_docs": n_docs,
        "bits": bits,
        "bands": bands,
        "candidate_pairs": int(total),
        "budget_pairs": budget,
        "within_budget": int(total) <= budget,
    }


# ------------------------------------------------- prefix-filtered exact

def jaccard_pairs_prefix(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard threshold join with PPJoin-style PREFIX + LENGTH
    FILTERING — same output as :func:`jaccard_pairs`, asymptotically less
    work.

    Theorem (prefix filter): order each doc's shingles by ascending
    global frequency; if J(A,B) ≥ t then A and B share at least one
    shingle within each one's first ⌊(1-t)·|set|⌋+1 shingles. So the
    candidate join runs on prefixes only (the RAREST shingles — tiny
    fan-out).  Length filter: J(A,B) ≥ t also forces t·|A| ≤ |B| ≤
    |A|/t, applied inside the candidate join so size-mismatched pairs
    never reach verification.

    Verification joins the candidate pairs against PER-DOC SHINGLE
    ARRAYS (one row per document, not the exploded shingle table) and
    counts the intersection with ``array_intersect`` — integer-exact,
    and the joined side is corpus-cardinality rather than
    shingle-cardinality.  At test scale the array side is broadcast; at
    cluster scale the candidate side is the (far smaller) shuffle side
    and AQE picks the build side from runtime stats.

    The df-ordered ranking and the verify arrays come from ONE groupBy
    (sorted struct arrays + slice), not a window pass plus a second
    aggregation — one shuffle fewer than the textbook formulation.

    Correctness is gate-verified: the DuckDB oracle computes the naive
    all-pairs join and the value hash must match.
    """
    # r12 (guide §2.3, narrower types): shingles hash to int64 AT THE
    # EXPLODE, so the checkpoint, the frequency groupBy, the join back,
    # and the struct sort all move/compare 8-byte ints instead of n-gram
    # strings.  Collision exposure is UNCHANGED from the previous shape
    # (which already verified on xxhash64 arrays): a 64-bit collision
    # inside one candidate pair (P < 1e-12 corpus-wide) is the only way
    # a value could move, and the DuckDB gate computes the exact string
    # join and would flag it.  Ordering ties now break by hash instead
    # of by string — a different but still TOTAL order, and the prefix
    # filter theorem holds for any fixed total order, so the candidate
    # set stays a provable superset and the exact verify yields the
    # same output.
    # r13 (guide §1/§4, driver boundary): the whole stage chain is built
    # from COMPOSED SQL STRINGS parsed once per selectExpr/where — the
    # Column-builder formulation cost ~700 py4j round-trips (~0.7 s) of
    # pure driver plan-build per query, action-traced.  Every expression
    # below is structurally identical to the former Column tree (same
    # literals via repr, same int/double promotions), so the physical
    # plan — and the output — is unchanged.
    t = repr(float(threshold))
    sh = df.selectExpr(
        f"`{id_col}` AS doc_id",
        f"explode(array_distinct({spark_sql_shingles(text_col, n)})) AS _s",
    ).selectExpr("doc_id", "xxhash64(_s) AS sh")
    sh = sh.localCheckpoint(eager=True)

    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    # one groupBy builds BOTH the df-ascending prefix and the verify
    # array: sort_array on (df, sh) structs == the window ORDER BY
    doc_arrays = (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(F.expr("transform(sort_array(collect_list(struct(_df, sh))), s -> s.sh)").alias("_shs"))
        .selectExpr("doc_id", "_shs", "CAST(size(_shs) AS long) AS n_sh")
        .localCheckpoint(eager=True)
    )
    n_docs = doc_arrays.count()

    prefix = doc_arrays.selectExpr(
        "doc_id",
        "n_sh",
        f"posexplode(slice(_shs, 1, CAST(floor((1 - {t}D) * n_sh) + 1 AS int))) AS (_pos, shh)",
    )

    # length filter rides the equality join: t·|A| ≤ |B| ≤ |A|/t
    # (double×count comparisons only — no division, no rounding hazard).
    # positional filter (the second "P" in PPJoin): a shared prefix token
    # at 1-based positions (i, j) bounds the overlap by
    # min(|A|-i, |B|-j) + 1; a true pair's FIRST common prefix token
    # always satisfies overlap ≥ t/(1+t)·(|A|+|B|), so keeping pairs
    # where ANY token row passes is a lossless superset.
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "shh")
        .where(
            f"x.doc_id < y.doc_id"
            f" AND y.n_sh >= {t}D * x.n_sh AND x.n_sh >= {t}D * y.n_sh"
            f" AND least(x.n_sh - (x._pos + 1), y.n_sh - (y._pos + 1)) + 1"
            f"     >= ({t}D / (1 + {t}D)) * (x.n_sh + y.n_sh)"
        )
        .selectExpr("x.doc_id AS doc_a", "y.doc_id AS doc_b")
        .distinct()
    )

    # verify on the per-doc int64 arrays (corpus-cardinality, one row
    # per doc) — _shs is ALREADY hashed, so the verify side ships as-is.
    # Broadcast only when the corpus side is small (test scale); at
    # cluster scale the candidate side is the smaller relation and AQE
    # picks the build side.
    hashed = doc_arrays.selectExpr("doc_id", "_shs AS _hs", "n_sh")
    aa = hashed.selectExpr("doc_id AS doc_a", "_hs AS _ha", "n_sh AS n_a")
    bb = hashed.selectExpr("doc_id AS doc_b", "_hs AS _hb", "n_sh AS n_b")
    if n_docs <= 100_000:
        aa, bb = F.broadcast(aa), F.broadcast(bb)
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(size(array_intersect(_ha, _hb)) AS long) AS n_common",
            "n_a",
            "n_b",
        )
        # integer threshold test first (t=n_c/(n_a+n_b-n_c) ≥ t, cross-
        # multiplied) so the division below runs on survivors only
        .where(f"n_common * (1 + {t}D) >= {t}D * (n_a + n_b)")
        .selectExpr(
            "doc_a", "doc_b", "n_common", "n_a", "n_b",
            "CAST(n_common / (n_a + n_b - n_common) AS double) AS jaccard",
        )
        .where(f"jaccard >= {t}D")
        .selectExpr("doc_a", "doc_b", "n_common", "n_a", "n_b", "jaccard")
    )


def containment_pairs_prefix(
    df: DataFrame, id_col: str, text_col: str, *, n: int = 3, threshold: float = 0.8
) -> DataFrame:
    """Exact DIRECTED containment join — C(A,B) = |A∩B|/|A| ≥ t →
    (doc_sub, doc_sup, n_common, n_sub, n_sup, containment) — with the
    ASYMMETRIC prefix filter (the quotation / doc-in-doc / train-on-
    subset detector Jaccard misses: a small doc swallowed by a big one
    has low Jaccard but containment ≈ 1).

    Theorem (asymmetric prefix filter): if |A∩B| ≥ t·|A| then A misses
    at most (1−t)·|A| of its own df-ordered shingles from B, so at
    least one of A's first ⌊(1−t)·|A|⌋+1 rarest shingles is in B.  The
    candidate join therefore probes the SUB side's prefix against the
    SUP side's FULL shingle list — prefix tokens are globally rare, so
    the full-side fan-out per key is small by construction.  Length
    filter: |B| ≥ t·|A| (no upper bound — the whole point).

    The threshold is converted ONCE to an exact rational num/den
    (``Fraction(threshold).limit_denominator``) and every test — prefix
    size, candidate length filter, final verification — is an integer
    cross-multiplication with that same rational, so (a) any caller
    threshold is honored end-to-end (candidates and verification can
    never disagree) and (b) no IEEE tie-rounding can drop a true pair,
    which the losslessness proof forbids.  Verification is the same
    corpus-cardinality array_intersect as :func:`jaccard_pairs_prefix`;
    the DuckDB oracle runs the naive all-directed-pairs join.
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator
    # r12: int64 shingles at the explode (see jaccard_pairs_prefix —
    # same narrower-types rationale, same unchanged collision exposure,
    # same any-total-order prefix-filter argument)
    # r13 (guide §1/§4): composed SQL strings, one parse per
    # selectExpr/where — see jaccard_pairs_prefix; expressions are
    # structurally identical to the former Column trees.
    sh = df.selectExpr(
        f"`{id_col}` AS doc_id",
        f"explode(array_distinct({spark_sql_shingles(text_col, n)})) AS _s",
    ).selectExpr("doc_id", "xxhash64(_s) AS sh")
    sh = sh.localCheckpoint(eager=True)
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("_df"))
    doc_arrays = (
        sh.join(dfreq, "sh")
        .groupBy("doc_id")
        .agg(F.expr("transform(sort_array(collect_list(struct(_df, sh))), s -> s.sh)").alias("_shs"))
        .selectExpr("doc_id", "_shs", "CAST(size(_shs) AS long) AS n_sh")
        .localCheckpoint(eager=True)
    )
    n_docs = doc_arrays.count()

    prefix = doc_arrays.selectExpr(
        "doc_id",
        "n_sh",
        # ⌊(1−t)·n⌋ + 1 computed in exact integers: (n·(den−num)) div den
        f"explode(slice(_shs, 1, CAST((n_sh * {den - num}) div {den} + 1 AS int))) AS shh",
    )
    full = doc_arrays.selectExpr("doc_id", "n_sh", "explode(_shs) AS shh")
    cand = (
        prefix.alias("x")
        .join(full.alias("y"), "shh")
        # |B|·den ≥ |A|·num — integer cross-multiply, provably a
        # superset of the verified set (no float tie-rounding)
        .where(f"x.doc_id != y.doc_id AND y.n_sh * {den} >= x.n_sh * {num}")
        .selectExpr("x.doc_id AS doc_sub", "y.doc_id AS doc_sup")
        .distinct()
    )

    hashed = doc_arrays.selectExpr("doc_id", "_shs AS _hs", "n_sh")
    aa = hashed.selectExpr("doc_id AS doc_sub", "_hs AS _ha", "n_sh AS n_sub")
    bb = hashed.selectExpr("doc_id AS doc_sup", "_hs AS _hb", "n_sh AS n_sup")
    if n_docs <= 100_000:
        aa, bb = F.broadcast(aa), F.broadcast(bb)
    return (
        cand.join(aa, "doc_sub")
        .join(bb, "doc_sup")
        .selectExpr(
            "doc_sub",
            "doc_sup",
            "CAST(size(array_intersect(_ha, _hb)) AS long) AS n_common",
            "n_sub",
            "n_sup",
        )
        # |A∩B|·den ≥ |A|·num — the SAME exact rational the candidate
        # stage used, so non-default thresholds verify consistently
        .where(f"n_common * {den} >= n_sub * {num}")
        .selectExpr(
            "doc_sub", "doc_sup", "n_common", "n_sub", "n_sup",
            "CAST(n_common / n_sub AS double) AS containment",
        )
    )


def sql_containment_pairs(
    table: str, id_col: str, text_col: str, *, n: int = 3
) -> str:
    """DuckDB oracle for :func:`containment_pairs_prefix` at t = 4/5:
    the naive all-directed-pairs shingle join — different plan, provably
    identical output (the prefix filter is lossless)."""
    sh = sql_shingles(text_col, n)
    return f"""
    WITH sh AS (
      SELECT {id_col} AS doc_id, u.sh AS sh
      FROM {table}, unnest(list_distinct({sh})) AS u(sh)
    ),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
             CAST(count(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.doc_sub, i.doc_sup, i.n_common,
           sa.n_sh AS n_sub, sb.n_sh AS n_sup,
           CAST(i.n_common AS DOUBLE) / sa.n_sh AS containment
    FROM inter i
      JOIN sizes sa ON sa.doc_id = i.doc_sub
      JOIN sizes sb ON sb.doc_id = i.doc_sup
    WHERE i.n_common * 5 >= sa.n_sh * 4
    """


# ------------------------------------------------- near-dup clustering

def connected_components(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    *,
    local_max_edges: int = 100_000,
) -> DataFrame:
    """Connected components over an undirected pair graph → (doc_id,
    cluster_id) where cluster_id is the MINIMUM member id — the
    canonicalization step after near-dup pair generation (keep one doc
    per cluster).

    Two physical strategies, one contract:

    - **small graphs** (≤ ``local_max_edges`` directed edges after
      dedup): exact union-find on the driver — near-dup pair sets are a
      tiny fraction of the corpus, and a driver pass beats 2-3 rounds of
      distributed jobs by an order of magnitude at test scale. The edge
      list is already the POST-threshold pair set, not the corpus. The
      default threshold is 100k edges: with wide string doc ids that is
      ~10-20 MB of driver heap — comfortably bounded even when the
      driver JVM is modestly sized (1M-edge lists measured in the
      hundreds of MB; see SCALE.md).
    - **large graphs**: iterative min-label propagation with pointer
      jumping (label-of-label), O(log diameter) rounds — the 100 TB
      path; flip ``local_max_edges=0`` to force it (tests pin both
      strategies equal).  Each round checkpoints via
      :func:`~binaryx_graph_spark.plans.lineage.checkpoint_cut`, not
      plain localCheckpoint: the round joins THREE views of the
      previous label frame (labels ⋈ neighbor-min ⋈ pointer), so the
      size statistics LogicalRDD carries across a checkpoint DOUBLE
      per round (measured 36 → 11,823 bits over 9 rounds on a 256-node
      chain) — on long-diameter graphs Catalyst's BigInt size
      arithmetic would dominate planning; the stats reset bounds it
      (SCALE.md addendum 32).
    """
    from ..plans.lineage import checkpoint_cut as _cut

    edges = (
        pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .unionByName(pairs.select(F.col(b).alias("x"), F.col(a).alias("y")))
        .distinct()
        .transform(_cut)
    )
    if edges.count() <= local_max_edges:
        rows = edges.collect()
        parent: dict = {}

        def find(v):
            r = v
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(v, v) != v:  # path compression
                parent[v], v = r, parent[v]
            return r

        verts = set()
        for r in rows:
            x, y = r["x"], r["y"]
            verts.add(x)
            verts.add(y)
            rx, ry = find(x), find(y)
            if rx != ry:
                # union by MIN root so cluster_id = min member id
                lo, hi = (rx, ry) if rx < ry else (ry, rx)
                parent[hi] = lo
        out = sorted((v, find(v)) for v in verts)
        spark = pairs.sparkSession
        schema = pairs.select(F.col(a).alias("doc_id"), F.col(a).alias("cluster_id")).schema
        return spark.createDataFrame([(v, c) for v, c in out], schema)
    labels = (
        edges.select(F.col("x").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .transform(_cut)
    )
    while True:
        neighbor_min = (
            edges.join(labels, edges.y == labels.doc_id)
            .groupBy(F.col("x").alias("doc_id"))
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        # pointer jump: also adopt the label OF the current label —
        # convergence in O(log diameter) rounds instead of O(diameter)
        ptr = labels.select(
            F.col("doc_id").alias("_pid"), F.col("cluster_id").alias("_pcl")
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .join(ptr, F.col("cluster_id") == F.col("_pid"), "left")
            .select(
                "doc_id",
                F.col("cluster_id").alias("_old"),
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("_nmin"), F.col("cluster_id")),
                    F.coalesce(F.col("_pcl"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .transform(_cut)
        )
        # the old label rides along in the checkpoint, so the
        # convergence check is a filter on materialized data — no
        # second join job per round
        changed = not updated.filter(F.col("cluster_id") != F.col("_old")).isEmpty()
        labels = updated.select("doc_id", "cluster_id")
        if not changed:
            return labels


# ------------------------------------------------- exact substring dedup

#: character-span geometry for exact substring dedup: 64-char spans
#: sampled every 32 chars (half-overlapping, so any repeated region of
#: ≥ 95 chars is guaranteed to contain at least one aligned full span
#: in both copies when the copies start at the same offset mod 32; in
#: practice boilerplate repeats are much longer than the span).
SPAN_LEN = 64
SPAN_STRIDE = 32


def repeated_spans(
    df: DataFrame, id_col: str, text_col: str, *, span: int = SPAN_LEN, stride: int = SPAN_STRIDE
) -> DataFrame:
    """Exact substring dedup (the train-data hygiene pass popularized by
    "Deduplicating Training Data Makes Language Models Better"): find
    fixed-length character spans that appear verbatim in MORE THAN ONE
    document → (span_hash, n_docs, n_occurrences, min_doc, max_doc).

    Plan: per doc, sample offsets 1, 1+stride, … (a `sequence` +
    `transform` projection — no join), hash each span once (sha256, the
    engine-portable convention), then ONE partial-aggregated groupBy on
    span_hash. Work is O(total_chars/stride) rows — linear in corpus
    size, shuffle keyed on content hash (uniform, no skew) — the same
    shape that holds at 100 TB. Suffix-automaton exactness (arbitrary
    alignment) is traded for the stride grid; the miss window is spans
    < span + stride chars, documented here and pinned by the oracle.
    """
    offs = F.sequence(
        F.lit(1), F.greatest(F.lit(1), F.length(F.col(text_col)) - F.lit(span - 1)), F.lit(stride)
    )
    spans = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.transform(offs, lambda o: F.sha2(F.substring(F.col(text_col), o, span), 256))
        ).alias("span_hash"),
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("doc_id").cast("long").alias("min_doc"),
            F.max("doc_id").cast("long").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


def sql_repeated_spans(
    table: str, id_col: str, text_col: str, *, span: int = SPAN_LEN, stride: int = SPAN_STRIDE
) -> str:
    """DuckDB twin of :func:`repeated_spans` — the same offset grid via
    the scalar list function ``range`` (end-EXCLUSIVE, hence stop+1;
    lateral generate_series rejects row-column parameters) + unnest.
    NOTE substring(col, o, n) beyond the end yields the short tail span
    in BOTH engines (verified by the gate)."""
    return f"""
    WITH spans AS (
      SELECT doc_id,
             sha256(substr(t, CAST(o AS INTEGER), {span})) AS span_hash
      FROM (
        SELECT {id_col} AS doc_id, {text_col} AS t,
               unnest(range(1, greatest(1, length({text_col}) - {span - 1}) + 1, {stride})) AS o
        FROM {table}
      )
    )
    SELECT span_hash,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc
    FROM spans
    GROUP BY span_hash
    HAVING count(DISTINCT doc_id) > 1
    """


# ------------------------------------------------ paragraph-level dedup (C4)

PARA_WORDS = 10  # block width for corpora without explicit separators


def paragraph_blocks_arr(toks: Column, *, words: int = PARA_WORDS) -> Column:
    """Pseudo-paragraph blocks from an ALREADY-SPLIT token array column.
    Materialize the split through a projection first: lambdas re-evaluate
    captured expressions per element (no CSE across the lambda boundary),
    so passing ``split(text)`` directly re-splits per block."""
    n_blocks = F.ceil(F.size(toks) / F.lit(words)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.array_join(F.slice(toks, i * words + 1, words), " "),
    )


def paragraph_blocks(col: Column, *, words: int = PARA_WORDS) -> Column:
    """Segment a text column into ordered pseudo-paragraphs: consecutive
    ``words``-word blocks. Real corpora would split on ``\\n\\n`` /
    sentence boundaries instead — the dedup below is agnostic to the
    segmentation, it only needs an ordered array<string>. An empty text
    yields one empty block (split('', ' ') = [''] in both engines).
    Convenience wrapper; hot paths project the split first and use
    :func:`paragraph_blocks_arr`."""
    return paragraph_blocks_arr(F.split(col, " "), words=words)


def paragraph_dedup(
    df: DataFrame, id_col: str, text_col: str, *, words: int = PARA_WORDS
) -> DataFrame:
    """C4-style paragraph/line-level dedup: a paragraph that appears in
    multiple documents is kept only at its globally-first occurrence
    (min (doc_id, position)); every document is reconstructed from its
    surviving paragraphs → (doc_id, n_paras, n_kept, cleaned_text).

    Scale design: the keep-decision is a partial-aggregated groupBy on
    the paragraph (min struct(doc, idx) — map-side combine absorbs
    hot boilerplate paragraphs, no single-task window partition), then
    one equi-join back; reconstruction is a per-doc collect_list —
    bounded by document size, not corpus size. Two shuffles total
    (paragraph, doc_id), both on uniform-or-AQE-handled keys."""
    paras = _doc_paragraphs(df, id_col, text_col, words=words)
    owners = paras.groupBy("para").agg(
        F.min(F.struct("doc_id", "idx")).alias("owner")
    )
    kept = (F.col("doc_id") == F.col("owner.doc_id")) & (F.col("idx") == F.col("owner.idx"))
    return (
        paras.join(owners, "para")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paras"),
            F.sum(kept.cast("int")).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.when(kept, F.struct("idx", "para")))),
                    lambda s: s.getField("para"),
                ),
                " ",
            ).alias("cleaned_text"),
        )
    )


def _doc_paragraphs(df: DataFrame, id_col: str, text_col: str, *, words: int) -> DataFrame:
    """(doc_id, idx, para) — shared segmentation for the global and
    incremental paragraph-dedup passes."""
    toked = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_toks"),  # materialize once
    )
    return toked.select(
        "doc_id",
        F.posexplode(paragraph_blocks_arr(F.col("_toks"), words=words)).alias(
            "idx", "para"
        ),
    )


def incremental_paragraph_dedup(
    batch: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    words: int = PARA_WORDS,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of keep-first paragraph dedup against the
    accumulated kept-paragraph ``index`` (a 1-column ``para`` frame):
    a paragraph survives iff it is NOT in the index AND it is the
    batch-first occurrence (min (doc_id, idx) within the batch).
    Returns (per-doc result like :func:`paragraph_dedup`, fresh
    distinct paragraphs to append to the index).

    Contract: if batches arrive in ascending doc_id ranges, the union
    of per-batch results equals the global :func:`paragraph_dedup` —
    batch-first coincides with corpus-first. Per batch the work is
    O(batch) segmentation + one anti-join against the index; the
    standing corpus text is never rescanned."""
    paras = _doc_paragraphs(batch, id_col, text_col, words=words)
    fresh = paras.join(index, "para", "left_anti")
    owners = fresh.groupBy("para").agg(F.min(F.struct("doc_id", "idx")).alias("owner"))
    marked = paras.join(
        index.select("para").withColumn("_seen", F.lit(1)), "para", "left"
    ).join(owners, "para", "left")
    kept = F.coalesce(
        F.col("_seen").isNull()
        & (F.col("doc_id") == F.col("owner.doc_id"))
        & (F.col("idx") == F.col("owner.idx")),
        F.lit(False),
    )
    result = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras"),
        F.sum(kept.cast("int")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.when(kept, F.struct("idx", "para")))),
                lambda s: s.getField("para"),
            ),
            " ",
        ).alias("cleaned_text"),
    )
    return result, owners.select("para")


def sql_paragraph_dedup(
    table: str, id_col: str, text_col: str, *, words: int = PARA_WORDS
) -> str:
    """DuckDB twin of :func:`paragraph_dedup` — same block grid; the
    keep-first rule is expressed as row_number over (doc, idx) order
    (equivalent to the min-struct owner)."""
    w = words
    return f"""
    WITH paras AS (
      SELECT d.doc_id, CAST(u.i AS INTEGER) AS idx,
             array_to_string(string_split(d.t, ' ')[u.i*{w}+1 : u.i*{w}+{w}], ' ') AS para
      FROM (SELECT {id_col} AS doc_id, {text_col} AS t FROM {table}) d,
           unnest(range(0, CAST(ceil(len(string_split(d.t, ' ')) / {w}.0) AS BIGINT))) AS u(i)
    ),
    ranked AS (
      SELECT doc_id, idx, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
      FROM paras
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           coalesce(
             array_to_string(list(para ORDER BY idx) FILTER (WHERE rn = 1), ' '),
             '') AS cleaned_text
    FROM ranked
    GROUP BY doc_id
    """


# ------------------------------------------------- benchmark decontamination

def ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ANY word
    n-gram with the evaluation set — the standard training-data hygiene
    pass (GPT-3 App. C / Gopher / Llama all ship an n-gram-collision
    variant of this; n=8..13 on real corpora, parameterized here).

    Plan shape at 100 TB: the benchmark side is eval suites — thousands
    of documents, not billions — so its distinct shingle set broadcasts
    and the corpus side is ONE scan + explode + broadcast-hash semi-join
    (no shuffle of the corpus). Returns (doc_id, n_collisions) for
    contaminated documents only; drop them (or their colliding spans)
    downstream.
    """
    bcol = bench_text_col or text_col
    bench_sh = (
        benchmark.select(F.explode(F.array_distinct(shingles(F.col(bcol), n))).alias("sh"))
        .distinct()
    )
    doc_sh = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(shingles(F.col(text_col), n))).alias("sh"),
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_collisions"))
    )


def sql_ngram_decontaminate(
    table: str,
    bench_filter: str,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`ngram_decontaminate` for a benchmark carved
    out of ``table`` by ``bench_filter`` (corpus = the complement)."""
    sh = sql_shingles(text_col, n)
    return f"""
    WITH bench AS (
      SELECT DISTINCT unnest({sh}) AS sh FROM {table} WHERE {bench_filter}
    ),
    dsh AS (
      SELECT {id_col} AS doc_id, unnest(list_distinct({sh})) AS sh
      FROM {table} WHERE NOT ({bench_filter})
    )
    SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_collisions
    FROM dsh d JOIN bench b USING (sh)
    GROUP BY d.doc_id
    """


# ------------------------------------------------ leakage-safe splitting

def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    train_buckets: int = 8,
    n_buckets: int = 10,
) -> DataFrame:
    """Near-dup-aware train/test split: every near-duplicate CLUSTER
    lands entirely on one side, so a paraphrase of a training document
    can never leak into the eval split (the standard dataset-hygiene
    step after near-dup detection).

    ``pairs`` is any near-dup pair set (doc_a, doc_b). Clusters come
    from :func:`connected_components`; singleton documents are their
    own cluster. The side is chosen by a sha256 hash of the CLUSTER id
    (engine-portable, uniform, independent of id assignment order):
    train iff ``hash % n_buckets < train_buckets``.

    Returns (doc_id, cluster_id, split) — one row per document.
    """
    clusters = connected_components(pairs)
    rep = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(clusters, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    )
    bucket = F.pmod(
        F.conv(F.substring(F.sha2(F.col("cluster_id").cast("string"), 256), 1, 8), 16, 10)
        .cast("long"),
        F.lit(int(n_buckets)),
    )
    return rep.withColumn(
        "split",
        F.when(bucket < int(train_buckets), F.lit("train")).otherwise(F.lit("test")),
    )


def sql_leakage_safe_split(
    table: str,
    pairs_sql: str,
    *,
    id_col: str = "doc_id",
    train_buckets: int = 8,
    n_buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`leakage_safe_split`: recursive-CTE
    connected components over ``pairs_sql``, min-member cluster ids,
    identical sha256 bucket assignment."""
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (
      SELECT doc_a AS x, doc_b AS y FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(x, y) AS (
      SELECT x, y FROM edges
      UNION
      SELECT r.x, e.y FROM reach r JOIN edges e ON e.x = r.y
    ),
    labels AS (SELECT x AS doc_id, least(x, min(y)) AS cluster_id FROM reach GROUP BY x),
    rep AS (
      SELECT d.{id_col} AS doc_id,
             COALESCE(l.cluster_id, d.{id_col}) AS cluster_id
      FROM {table} d LEFT JOIN labels l ON l.doc_id = d.{id_col}
    )
    SELECT doc_id, cluster_id,
           CASE WHEN CAST(('0x' || substr(sha256(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     % {int(n_buckets)} < {int(train_buckets)}
                THEN 'train' ELSE 'test' END AS split
    FROM rep
    """


# ------------------------------------------- content-defined chunking

CDC_BOUNDARY_NIBBLE = "0"  # P(boundary) = 1/16 → mean chunk ≈ 16 tokens


def cdc_chunks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-defined chunking (the Rabin/LBFS idea at token
    granularity): a token ENDS a chunk when md5(token) ends in
    :data:`CDC_BOUNDARY_NIBBLE`.  Boundaries depend only on LOCAL
    content, so inserting or deleting a token resynchronizes within one
    chunk — unlike fixed-size windows, where a single leading insertion
    shifts every window and kills all sharing (pinned by test).

    → (doc_id, chunk_id, n_tokens, chunk_md5, chunk_text), one row per
    chunk.  md5 is the boundary oracle because BOTH engines ship the
    identical RFC 1321 hex (the portable-hash constraint; xxhash64 has
    no DuckDB twin).

    Scale design (r12, guide §2.4): chunking is PER-DOCUMENT, so it is
    a pure PROJECTION — boundary positions from one indexed array scan,
    chunks as in-row slices of the token array, one posexplode.  ZERO
    exchanges (the previous shape shuffled the exploded token table
    twice: a doc_id window sort for the running boundary count, then a
    (doc_id, chunk_id) groupBy to reassemble).  chunk_id = number of
    boundary tokens strictly before the chunk — identical to the old
    running sum; chunk sizes are geometric (mean 16 tokens), so the
    slice work per doc is O(tokens)."""
    from .textstats import tokens

    base = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_tk")
    )
    # 0-based indices of boundary tokens (a boundary token ENDS a chunk)
    bidx = F.filter(
        F.transform(
            F.col("_tk"),
            lambda t, i: F.when(
                F.substring(F.md5(t), 32, 1) == CDC_BOUNDARY_NIBBLE, i
            ).otherwise(F.lit(-1)),
        ),
        lambda v: v >= 0,
    )
    starts = F.concat(F.array(F.lit(0)), F.transform(bidx, lambda b: b + 1))
    ends = F.concat(F.transform(bidx, lambda b: b + 1), F.array(F.size("_tk")))
    spans = F.filter(
        F.zip_with(starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))),
        lambda c: c["e"] > c["s"],  # drop the empty trailing span
    )
    chunk_toks = F.transform(
        spans, lambda c: F.slice(F.col("_tk"), c["s"] + 1, c["e"] - c["s"])
    )
    return (
        base.select("doc_id", F.posexplode(chunk_toks).alias("chunk_id", "_ct"))
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.size("_ct").cast("long").alias("n_tokens"),
            F.array_join("_ct", " ").alias("chunk_text"),
        )
        .withColumn("chunk_md5", F.md5("chunk_text"))
        .select("doc_id", "chunk_id", "n_tokens", "chunk_md5", "chunk_text")
    )


def cdc_duplicate_chunks(
    df: DataFrame, id_col: str, text_col: str, *, k: int = 50
) -> DataFrame:
    """Corpus-wide duplicated-chunk mining over :func:`cdc_chunks`:
    chunks whose content recurs (boilerplate, quoted blocks, shared
    licenses) → (chunk_md5, n_tokens, n_occurrences, n_docs), top-k by
    (occurrences DESC, chunk_md5).  One chunk-key shuffle after the
    chunker's doc_id shuffle."""
    ch = cdc_chunks(df, id_col, text_col)
    return (
        ch.groupBy("chunk_md5", "n_tokens")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy(F.desc("n_occurrences"), "chunk_md5")
        .limit(k)
    )


def sql_cdc_duplicate_chunks(
    table: str, id_col: str = "doc_id", text_col: str = "text", *, k: int = 50
) -> str:
    """DuckDB twin of :func:`cdc_duplicate_chunks` — identical tokenizer,
    identical md5 boundary rule, identical running-sum chunk ids."""
    from .textstats import SQL_TOKENS

    toks = SQL_TOKENS.format(col=text_col)
    return f"""
    WITH pos AS (
      SELECT {id_col} AS doc_id,
             generate_subscripts({toks}, 1) AS pos,
             unnest({toks}) AS tok
      FROM {table}
    ),
    chunked AS (
      SELECT doc_id, pos, tok,
             coalesce(sum(CASE WHEN substr(md5(tok), 32, 1) = '{CDC_BOUNDARY_NIBBLE}'
                               THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS chunk_id
      FROM pos
    ),
    chunks AS (
      SELECT doc_id, chunk_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
      FROM chunked
      GROUP BY doc_id, chunk_id
    )
    SELECT chunk_md5, n_tokens,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM chunks
    GROUP BY chunk_md5, n_tokens
    HAVING count(*) > 1
    ORDER BY n_occurrences DESC, chunk_md5
    LIMIT {k}
    """
