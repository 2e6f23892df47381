"""Similarity search over embedding columns (north-star surface):
brute-force cosine top-k as the exact baseline, sign-LSH bucketing as
the scale path, all-pairs cosine near-dup for dedup.

Numerical determinism: embeddings are float32; both engines first cast
to float64 and compute the dot/norm as an IN-ORDER fold over the array
(Spark ``F.aggregate``, DuckDB ``list_sum∘list_transform∘list_zip``) —
identical IEEE operation order → bit-identical scores, no rounding
fudge needed for the oracle hash.

Scale posture (100 TB):
- brute force is O(N·Q) dots: fine for one query vector, the baseline
  for recall measurement
- sign-LSH: bucket = sign-bit string of the first B dimensions (a valid
  random-hyperplane family for roughly-isotropic embeddings); candidate
  set = same-bucket rows → the dot-product join touches ~N/2^B rows.
  On a cluster: repartition by bucket, broadcast the query side.
- all-pairs near-dup at scale would use the same bucketing as a
  prefilter (identical shape to MinHash-LSH banding in dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- kernels


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _lit_vec(vals) -> Column:
    """Literal double-array column from ONE parsed expression.  N
    individual F.lit() calls cost N py4j round-trips of pure driver
    plan-build — at dim 64 × 8 centroids that was ~1 s per IVF query,
    measured (r12).  repr() is Python's shortest round-trip decimal and
    Spark's D-suffixed literal parses via Double.parseDouble, so every
    parsed element is bit-equal to the Python float (verified).

    Non-finite guard (r13, ADVICE): repr(nan/inf) renders 'nanD'/'infD',
    which Spark would parse as an unresolved column reference — emit the
    SQL double('NaN')/double('Infinity') forms for those elements."""

    def _elt(x) -> str:
        x = float(x)
        if x != x:
            return "double('NaN')"
        if x == float("inf"):
            return "double('Infinity')"
        if x == float("-inf"):
            return "double('-Infinity')"
        return f"{x!r}D"

    return F.expr("array(" + ",".join(_elt(x) for x in vals) + ")")


def dot(a: Column, b: Column) -> Column:
    """In-order fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return (dot(a, b) / (F.sqrt(norm_sq(a)) * F.sqrt(norm_sq(b)))).cast("double")


SQL_DOT = (
    "list_sum(list_transform(list_zip({a}::DOUBLE[], {b}::DOUBLE[]), x -> x[1] * x[2]))"
)


def sql_cosine(a: str, b: str) -> str:
    d = SQL_DOT.format(a=a, b=b)
    na = SQL_DOT.format(a=a, b=a)
    nb = SQL_DOT.format(a=b, b=b)
    return f"CAST({d} / (sqrt({na}) * sqrt({nb})) AS DOUBLE)"


# ------------------------------------------------------------- operators


def cosine_topk(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Brute-force cosine top-k against one stored vector →
    (vec_id, cos_sim), excluding the query row, ties broken on id.
    ``where`` restricts the CANDIDATES (filtered retrieval, the RAG
    shape) — the query vector is looked up before the filter, so a
    query row outside the filter still anchors the search."""
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    cand = embeddings if where is None else embeddings.filter(where)
    return (
        cand.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def sign_bucket(vec_col: Column, bits: int = 8, offset: int = 0) -> Column:
    """Sign-LSH bucket id: '1'/'0' per dimension sign, dims
    [offset+1 .. offset+bits] (offset picks the LSH band)."""
    parts = [
        F.when(F.element_at(vec_col, offset + i + 1) > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def sql_sign_bucket(vec: str, bits: int = 8, offset: int = 0) -> str:
    parts = [
        f"CASE WHEN {vec}[{offset + i + 1}] > 0 THEN '1' ELSE '0' END" for i in range(bits)
    ]
    return " || ".join(parts)


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN variant: only rows in the query's sign-LSH bucket are scored.
    Approximate by construction — recall vs :func:`cosine_topk` is
    measured in tests; the candidate-set reduction is the point."""
    with_bucket = embeddings.withColumn("_bkt", sign_bucket(F.col(vec_col), bits))
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), F.col("_bkt").alias("_qbkt")
    )
    return (
        with_bucket.join(F.broadcast(q), F.col("_bkt") == F.col("_qbkt"))
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def _flip_bit(bkt: Column, i: int, bits: int) -> Column:
    """Bucket string with bit i flipped (0-indexed)."""
    flipped = F.when(F.substring(bkt, i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1"))
    return F.concat(F.substring(bkt, 1, i), flipped, F.substring(bkt, i + 2, bits - i - 1))


def cosine_topk_lsh_multiprobe(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe sign-LSH ANN: scores the query's own bucket PLUS all
    ``bits`` hamming-1 neighbor buckets (1+bits probes) — the standard
    recall-recovery technique that keeps the candidate lookup an
    EQUI-join (the probe buckets explode from the broadcast query row;
    the corpus side never fans out). Candidate set ≈ (1+bits)/2^bits of
    the corpus; recall strictly dominates single-probe at the same
    bucket width."""
    with_bucket = embeddings.withColumn("_bkt", sign_bucket(F.col(vec_col), bits))
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"), F.col("_bkt").alias("_qbkt")
    )
    probes = q.select(
        "_qvec",
        F.explode(
            F.array(F.col("_qbkt"), *[_flip_bit(F.col("_qbkt"), i, bits) for i in range(bits)])
        ).alias("_pbkt"),
    )
    return (
        with_bucket.join(F.broadcast(probes), F.col("_bkt") == F.col("_pbkt"))
        .filter(F.col(id_col) != query_id)
        .select(id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def sql_lsh_multiprobe(
    table: str, query_id: int, *, k: int = 10, bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB twin of :func:`cosine_topk_lsh_multiprobe`."""
    flips = ", ".join(
        f"substr(q.bkt, 1, {i}) || (CASE WHEN substr(q.bkt, {i + 1}, 1) = '1' "
        f"THEN '0' ELSE '1' END) || substr(q.bkt, {i + 2})"
        for i in range(bits)
    )
    cos = sql_cosine(f"e.{vec_col}", f"p.{vec_col}")
    return f"""
    WITH b AS (
      SELECT {id_col}, {vec_col}, {sql_sign_bucket(vec_col, bits)} AS bkt FROM {table}
    ),
    q AS (SELECT {vec_col}, bkt FROM b WHERE {id_col} = {query_id}),
    probes AS (
      SELECT q.{vec_col}, t.pb
      FROM q, unnest([q.bkt, {flips}]) AS t(pb)
    )
    SELECT e.{id_col}, {cos} AS cos_sim
    FROM b e JOIN probes p ON e.bkt = p.pb
    WHERE e.{id_col} <> {query_id}
    ORDER BY cos_sim DESC, e.{id_col}
    LIMIT {k}
    """


def embedding_near_dup(
    embeddings: DataFrame,
    *,
    threshold: float = 0.95,
    bands: int = 4,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Banded sign-LSH cosine near-duplicates → (id_a, id_b, cos_sim ≥ thr).

    The scale path (no unconditioned crossJoin): each vector gets
    ``bands`` sign-LSH bucket ids (band k = sign bits of dims
    [k·band_bits+1 .. (k+1)·band_bits]); candidate pairs are the union
    of the per-band bucket-equality EQUI-joins (shuffle on the band
    hash, never all-pairs), deduped, then exact cosine verifies only
    the candidates. Recall = 1-(1-p^r)^b with p = 1-θ/π — at real
    near-dup thresholds (0.9+) this is ≈1 while random pairs are
    pruned ~4-5×; more bands buys recall linearly in shuffle volume.
    Approximate by construction: the DuckDB oracle applies the SAME
    banding, so the gate is exact on the operator's actual contract.
    """
    base = embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    cand = None
    for k in range(bands):
        bk = base.withColumn("_bkt", sign_bucket(F.col("_v"), band_bits, offset=k * band_bits))
        a = bk.select(F.col("_id").alias("id_a"), F.col("_bkt").alias("_ba"))
        b = bk.select(F.col("_id").alias("id_b"), F.col("_bkt").alias("_bb"))
        pairs_k = (
            a.join(b, F.col("_ba") == F.col("_bb"))
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
        )
        cand = pairs_k if cand is None else cand.unionByName(pairs_k)
    cand = cand.distinct()
    va = base.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = base.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine(F.col("_va"), F.col("_vb")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def sql_embedding_near_dup(
    table: str,
    *,
    threshold: float,
    bands: int = 4,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`embedding_near_dup` — same banding, same
    verify, so the gate hash matches the bucketed operator exactly."""
    band_eq = " OR ".join(
        f"({sql_sign_bucket('a.' + vec_col, band_bits, offset=k * band_bits)})"
        f" = ({sql_sign_bucket('b.' + vec_col, band_bits, offset=k * band_bits)})"
        for k in range(bands)
    )
    cos = sql_cosine(f"a.{vec_col}", f"b.{vec_col}")
    return f"""
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, {cos} AS cos_sim
    FROM {table} a JOIN {table} b
      ON a.{id_col} < b.{id_col} AND ({band_eq})
    WHERE {cos} >= {threshold}
    """


# ------------------------------------------------------------- IVF variant

#: fixed-point quantum for exact k-means centroid sums: components are
#: snapped to a 2^-20 grid as int64, so partial sums are exact and
#: order-independent and BOTH engines derive bit-identical centroids.
KMEANS_SCALE = 1 << 20


def _quantize(vec_col: Column) -> Column:
    """array<float> → array<long> on the 2^-20 grid (half-up)."""
    return F.transform(
        vec_col,
        lambda x: F.floor(x.cast("double") * F.lit(float(KMEANS_SCALE)) + F.lit(0.5)).cast(
            "long"
        ),
    )


def _centroid_frame(spark, cents: dict[int, list[float]]) -> DataFrame:
    """{centroid_id: [double]} → broadcastable (centroid_id, _cvec) frame."""
    rows = [(int(cid), [float(x) for x in vec]) for cid, vec in sorted(cents.items())]
    return spark.createDataFrame(rows, "centroid_id long, _cvec array<double>")


def _py_sqrt_norm(vec: list[float]) -> float:
    """In-order fold ‖v‖ in Python — the SAME IEEE op sequence as the
    Column kernel (F.aggregate) and DuckDB list_sum, so a driver-side
    centroid norm is bit-identical to one computed engine-side."""
    import math

    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def _py_cosine(qv: list[float], qn: float, c: list[float]) -> float:
    """Driver-side cosine(query, centroid) with the identical in-order
    fold + single-division op sequence as :func:`cosine` / the DuckDB
    oracle — used for IVF probe selection, where a bit-different score
    near a tie would flip the probe set."""
    acc = 0.0
    for x, y in zip(qv, c):
        acc += x * y
    return acc / (qn * _py_sqrt_norm(c))


def _argmax_centroid(vec_col: Column, codebook: dict[int, list[float]]) -> Column:
    """Nearest-centroid id as a PURE projection expression (no join, no
    window, no shuffle): one cosine per centroid against literal arrays,
    argmax via array_max on (score, -id, id) structs — ties break to the
    smallest centroid_id, matching the oracle's ``ORDER BY cos DESC,
    centroid_id`` row_number. The row's norm is computed ONCE (HOF
    lambdas get no CSE — measured in SCALE.md); centroid norms are
    driver-side constants folded into the expression."""
    n_v = F.sqrt(norm_sq(vec_col))
    entries = []
    for cid, c in sorted(codebook.items()):
        lit_c = _lit_vec(c)
        cos_k = (dot(vec_col, lit_c) / (n_v * F.lit(_py_sqrt_norm(c)))).cast("double")
        entries.append(
            F.struct(
                cos_k.alias("s"), F.lit(float(-cid)).alias("nk"), F.lit(int(cid)).alias("cid")
            )
        )
    return F.array_max(F.array(*entries)).getField("cid")


def kmeans_codebook(
    embeddings: DataFrame,
    *,
    n_centroids: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[float]]:
    """Deterministic Lloyd k-means codebook → {centroid_id: [double]}.

    Seeds = the first ``n_centroids`` vectors by id; each iteration
    assigns (argmax cosine, tie → min centroid_id) then recomputes
    centroids as EXACT int64 sums of 2^-20-quantized components divided
    once in double: ``float(sum[d]) / float(n * KMEANS_SCALE)``. Every
    step is order-independent integer math or a single IEEE-754 op, so
    the DuckDB oracle (:func:`sql_ivf_kmeans`) replays the exact same
    centroids bit-for-bit. Empty clusters keep their previous centroid.

    The driver collects only k×(dim+1) aggregated values per iteration —
    the canonical distributed k-means shape (Spark MLlib likewise
    collects centers each round); the per-row work stays executor-side.
    """
    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _quantize(F.col(vec_col)).alias("_vq"),
    ).cache()  # 2-3 passes over the corpus; scan once, no materialization job

    try:
        seeds = base.orderBy("_id").limit(n_centroids).select("_id", "_vq").collect()
        if not seeds:
            # empty corpus: no codebook (callers return the empty typed
            # frame) — never an IndexError on seeds[0]
            return {}
        dim = len(seeds[0]["_vq"])
        cents: dict[int, tuple[list[int], int]] = {
            int(r["_id"]): (list(r["_vq"]), 1) for r in seeds
        }

        def doubles(c: dict[int, tuple[list[int], int]]) -> dict[int, list[float]]:
            return {
                cid: [float(s) / float(n * KMEANS_SCALE) for s in sums]
                for cid, (sums, n) in c.items()
            }

        for _ in range(iters):
            # assignment is a pure projection (argmax over literal
            # centroids), so one iteration = ONE shuffle: the k-group
            # partial-aggregated sum
            upd = (
                base.select(_argmax_centroid(F.col("_v"), doubles(cents)).alias("centroid_id"), "_vq")
                .groupBy("centroid_id")
                .agg(
                    *[F.sum(F.element_at("_vq", d + 1)).alias(f"s{d}") for d in range(dim)],
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()
            )
            new = dict(cents)  # empty clusters keep their previous centroid
            for r in upd:
                new[int(r["centroid_id"])] = (
                    [int(r[f"s{d}"]) for d in range(dim)],
                    int(r["n"]),
                )
            cents = new
        return doubles(cents)
    finally:
        base.unpersist()


def ivf_assign(
    embeddings: DataFrame,
    codebook: dict[int, list[float]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization against a trained codebook — a single
    narrow projection → (vec_id, embedding, centroid_id)."""
    return embeddings.select(
        id_col, vec_col, _argmax_centroid(F.col(vec_col), codebook).alias("centroid_id")
    )


#: trained codebooks per corpus key — the codebook is a trained ARTIFACT
#: (like an index): production persists it next to the inverted lists and
#: queries reuse it; retraining per query would be wrong there, so the
#: engine caches per corpus identity too. Training is deterministic, so a
#: cached codebook is bit-identical to a fresh one.
_CODEBOOK_CACHE: dict[tuple, dict[int, list[float]]] = {}


def _codebook_content_key(ck: tuple) -> str:
    """Content address for a trained codebook: the cache key plus a
    hash of THIS module's source (training-code version) — a new
    implementation invalidates old artifacts automatically, and training
    is deterministic so a hit is bit-identical to retraining."""
    import hashlib
    from pathlib import Path

    h = hashlib.sha256()
    h.update(repr(ck).encode())
    h.update(Path(__file__).read_bytes())
    return h.hexdigest()[:24]


def _default_model_store(spark, ck: tuple):
    """The per-corpus MODEL WAREHOUSE (`sources/model_store.ModelStore`)
    a corpus_key resolves to when the caller does not pass a store.

    Resolution order: the session conf ``spark.bxg.modelRoot`` (the
    production setting — a shared warehouse root on real storage, so a
    cluster's executors and future sessions all resolve artifacts
    through one durable location), else a root derived from the corpus
    identity under the local tempdir — the documented NOTEBOOK fallback
    only: on a real cluster the tempdir is driver-local, which is
    exactly why the conf exists.  Either way artifacts live on the
    manifest protocol — commit, time travel, vacuum — never loose
    tempfiles."""
    import hashlib
    import tempfile
    from pathlib import Path

    from ..sources.model_store import ModelStore

    key = hashlib.md5(repr(ck[0]).encode()).hexdigest()[:12]
    conf_root = spark.conf.get("spark.bxg.modelRoot", None)
    if conf_root:
        return ModelStore(spark, str(Path(conf_root) / f"corpus_{key}"))
    root = Path(tempfile.gettempdir()) / f"bxg_models_wh_{key}"
    return ModelStore(spark, str(root))


def _codebook_cache_get(
    ck: tuple | None, spark=None, store=None
) -> dict[int, list[float]] | None:
    """Two-level codebook cache: process dict, then the WAREHOUSE model
    store (`_models` table — LWW commit, time travel, vacuum; shared
    across sessions, so the driver gate's fresh process reuses the
    trained artifact instead of retraining deterministically)."""
    if ck is None:
        return None
    if ck in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[ck]
    if store is None and spark is not None:
        store = _default_model_store(spark, ck)
    if store is None:
        return None
    payload = store.get(
        f"codebook:{ck!r}", content_key=_codebook_content_key(ck)
    )
    if payload is None:
        return None
    book = {int(k): v for k, v in payload.items()}
    _CODEBOOK_CACHE[ck] = book
    return book


def _codebook_cache_put(
    ck: tuple | None, book: dict[int, list[float]], spark=None, store=None
) -> None:
    if ck is None:
        return
    _CODEBOOK_CACHE[ck] = book
    if store is None and spark is not None:
        store = _default_model_store(spark, ck)
    if store is None:
        return
    try:
        store.put(
            f"codebook:{ck!r}",
            book,
            kind="kmeans_codebook",
            content_key=_codebook_content_key(ck),
        )
    except Exception:
        pass  # best-effort publish: a lost artifact only costs retraining


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_key: str | None = None,
    where: Column | None = None,
) -> DataFrame:
    """IVF-flat ANN with a real k-means codebook: score only vectors
    whose centroid is among the query's ``n_probe`` nearest centroids.

    ``where`` gives FILTERED retrieval (the RAG shape: ``lang = 'en'
    AND similarity top-k``): the predicate restricts the CANDIDATES —
    applied before centroid assignment, so Catalyst pushes it into the
    parquet scan (PushedFilters) and only matching rows in the probed
    lists are ever assigned or scored.  The codebook and probe
    selection are the INDEX and stay unfiltered (trained once per
    corpus, shared by every predicate — re-training per filter would
    make recall accounting incomparable across queries).
    At scale the lists are ``repartition(centroid_id)``-ed parquet
    partitions and a probe touches n_probe/n_centroids of the data;
    codebook training runs on a sample there. Pass ``corpus_key`` (e.g.
    the table path) to reuse the trained codebook across queries over
    the same corpus — identical results, training paid once.

    Probe selection runs ON THE DRIVER (the FAISS shape: the codebook is
    a dimension-sized driver artifact, and scoring the query against k
    centroids is O(k·dim) — spinning up a Spark job for it tripled the
    query's wall time). The Python cosine is the same in-order IEEE fold
    as the Column kernel and the DuckDB oracle, so the chosen probe set
    — including near-ties — is bit-identical. The query vector is folded
    into the final projection as a literal, so the whole query is ONE
    job: scan → assign+score projection → TakeOrderedAndProject."""
    ck = (corpus_key, n_centroids, kmeans_iters) if corpus_key is not None else None
    codebook = _codebook_cache_get(ck, embeddings.sparkSession)
    if codebook is None:
        codebook = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
        )
        _codebook_cache_put(ck, codebook, embeddings.sparkSession)
    qrow = embeddings.filter(F.col(id_col) == query_id).select(vec_col).head()
    if not codebook or qrow is None:
        # empty corpus / unknown query id: empty typed frame, like the
        # brute-force baseline's empty cross join
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("cos_sim")
        ).limit(0)
    qv = [float(x) for x in qrow[0]]
    qn = _py_sqrt_norm(qv)
    scored = sorted(
        ((-_py_cosine(qv, qn, c), cid) for cid, c in codebook.items())
    )  # cos DESC, centroid_id ASC — the oracle's row_number ordering
    probe_ids = [cid for _negcos, cid in scored[:n_probe]]
    lit_q = _lit_vec(qv)
    cand = embeddings if where is None else embeddings.filter(where)
    assigned = ivf_assign(cand, codebook, id_col=id_col, vec_col=vec_col)
    return (
        assigned.filter(F.col("centroid_id").isin(probe_ids))
        .filter(F.col(id_col) != query_id)
        .select(
            id_col,
            (dot(F.col(vec_col), lit_q) / (F.sqrt(norm_sq(F.col(vec_col))) * F.lit(qn)))
            .cast("double")
            .alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """Batch k-NN join: for EVERY query vector, the top-k corpus
    neighbors by cosine → (query_id, vec_id, cos_sim, rank). The
    retrieval/labeling primitive (RAG indexing, near-dup audit,
    kNN-classifier labeling) that single-query ANN doesn't cover.

    Plan: the query batch broadcasts (batches are 10²-10⁵ rows; the
    corpus is the big side), scoring is one projection over
    corpus × broadcast-queries, and per-query top-k is a window over
    the scored pairs partitioned by query id. No corpus shuffle until
    the scored pairs, and those are |corpus|·|batch| only for the EXACT
    variant — at 100 TB run the same window over IVF/LSH-pruned
    candidate pairs instead (both prefilters are built here; compose
    ``ivf_assign``/``sign_bucket`` upstream), which drops the scored
    set by n_probe/n_centroids while keeping this operator unchanged.
    Ties break on corpus id (deterministic, oracle-replayable)."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv")
    )
    scored = (
        corpus.select(F.col(corpus_id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
        .crossJoin(F.broadcast(q))
    )
    if exclude_self:
        # queries drawn from the corpus itself: keep a row out of its
        # own neighbor list (ids share a namespace then)
        scored = scored.filter(F.col("vec_id") != F.col("_qid"))
    scored = scored.select(
        F.col("_qid").alias(query_id_col),
        "vec_id",
        cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim"),
    )
    return _topk_per_query(scored, k, query_id_col)


def _topk_per_query(scored: DataFrame, k: int, query_id_col: str) -> DataFrame:
    """Per-query top-k over (query_id, vec_id, cos_sim) — the shared
    tail of the exact and IVF-pruned batch joins (id tie-breaks)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def sql_knn_join(
    table: str,
    query_filter: str,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`knn_join` for a query batch carved out of
    ``table`` by ``query_filter`` (corpus = the full table, query rows
    excluded from their own neighbor lists by id inequality)."""
    cos = sql_cosine("c.v", "q.v")
    return f"""
    WITH e AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}),
    q AS (SELECT vec_id, v FROM e WHERE vec_id IN
          (SELECT {id_col} FROM {table} WHERE {query_filter})),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id, {cos} AS cos_sim,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {cos} DESC, c.vec_id) AS rank
      FROM e c CROSS JOIN q
      WHERE c.vec_id <> q.vec_id
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= {k}
    """


def knn_join_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    kmeans_iters: int = 2,
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    corpus_key: str | None = None,
) -> DataFrame:
    """IVF-pruned batch k-NN join — the scale path :func:`knn_join`'s
    docstring promises: each query scores only corpus vectors whose
    trained-codebook centroid is among the query's ``n_probe`` nearest
    centroids, so the scored set is ~n_probe/n_centroids of the exact
    |corpus|·|batch| product. Approximate by construction (a true
    neighbor outside the probed lists is missed); the oracle replays
    codebook training, assignment, probe selection and scoring, so the
    contract — misses included — is pinned.

    Plan: probe selection is a |batch| × n_centroids cross of two
    broadcast-sized frames (no driver loop over queries — the batch
    stays distributed, unlike the single-query driver-side probe in
    :func:`cosine_topk_ivf`); candidates come from the centroid
    equi-join against the assignment (at 100 TB: the partitioned IVF
    lists of :func:`build_ivf_lists`, probed via partition pruning);
    the final per-query top-k is the same window as the exact join."""
    from pyspark.sql.window import Window

    ck = (corpus_key, n_centroids, kmeans_iters) if corpus_key is not None else None
    codebook = _codebook_cache_get(ck, corpus.sparkSession)
    if codebook is None:
        codebook = kmeans_codebook(
            corpus,
            n_centroids=n_centroids,
            iters=kmeans_iters,
            id_col=corpus_id_col,
            vec_col=vec_col,
        )
        _codebook_cache_put(ck, codebook, corpus.sparkSession)
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(cid, list(map(float, c))) for cid, c in sorted(codebook.items())],
        "centroid_id int, cd array<double>",
    )
    q = queries.select(F.col(query_id_col).alias("_qid"), F.col(vec_col).alias("_qv"))
    wp = Window.partitionBy("_qid").orderBy(F.desc("_pcos"), "centroid_id")
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("_qid", "_qv", "centroid_id", cosine(F.col("cd"), F.col("_qv")).alias("_pcos"))
        .withColumn("_pr", F.row_number().over(wp))
        .filter(F.col("_pr") <= n_probe)
        .select("_qid", "_qv", "centroid_id")
    )
    assigned = ivf_assign(corpus, codebook, id_col=corpus_id_col, vec_col=vec_col)
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        F.col("_qid").alias(query_id_col),
        F.col(corpus_id_col).alias("vec_id"),
        F.col(vec_col).alias("_cv"),
        "_qv",
    )
    if exclude_self:
        scored = scored.filter(F.col("vec_id") != F.col(query_id_col))
    scored = scored.select(
        query_id_col, "vec_id", cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim")
    )
    return _topk_per_query(scored, k, query_id_col)


def sql_knn_join_ivf(
    table: str,
    query_filter: str,
    *,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`knn_join_ivf` — replays the identical
    codebook training (shared kmeans CTEs), per-query probe selection,
    centroid-pruned candidate set, and window top-k. (`q` is taken by
    the kmeans CTEs; the query batch is `qb`.)"""
    ctes = _sql_kmeans_ctes(
        table, n_centroids=n_centroids, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col
    )
    ctes += [
        f"""qb AS (SELECT vec_id, v FROM e WHERE vec_id IN
          (SELECT {id_col} FROM {table} WHERE {query_filter}))""",
        f"""probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT qb.vec_id AS query_id, c.centroid_id,
               row_number() OVER (PARTITION BY qb.vec_id
                                  ORDER BY {sql_cosine('c.cd', 'qb.v')} DESC, c.centroid_id) AS pr
        FROM df c CROSS JOIN qb
      ) WHERE pr <= {n_probe}
    )""",
    ]
    body = ",\n    ".join(ctes)
    cos = sql_cosine("ev.v", "qb.v")
    return f"""
    WITH {body},
    scored AS (
      SELECT qb.vec_id AS query_id, ev.vec_id AS vec_id, {cos} AS cos_sim,
             row_number() OVER (PARTITION BY qb.vec_id
                                ORDER BY {cos} DESC, ev.vec_id) AS rank
      FROM qb
      JOIN probes p ON p.query_id = qb.vec_id
      JOIN af a ON a.centroid_id = p.centroid_id
      JOIN e ev ON ev.vec_id = a.vec_id
      WHERE ev.vec_id <> qb.vec_id
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
    FROM scored WHERE rank <= {k}
    """


def build_ivf_lists(
    embeddings: DataFrame,
    codebook: dict[int, list[float]],
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF inverted lists: the assignment projection written
    as parquet PARTITIONED BY centroid_id — the physical index layout at
    scale. A probe then reads only n_probe/n_centroids of the data via
    partition-directory pruning (visible as ``PartitionFilters`` in the
    scan), instead of scanning the corpus and filtering."""
    assigned = ivf_assign(embeddings, codebook, id_col=id_col, vec_col=vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)


def cosine_topk_ivf_lists(
    spark,
    lists_path: str,
    codebook: dict[int, list[float]],
    query_vec: list[float],
    *,
    k: int = 10,
    n_probe: int = 2,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe against PERSISTED inverted lists (:func:`build_ivf_lists`):
    driver-side probe selection (same in-order fold as
    :func:`cosine_topk_ivf`), then a scan whose ``centroid_id`` filter is
    a partition-directory prune — the scan never touches the other
    lists' files. Returns the same (id, cos_sim) top-k as the in-memory
    path for the same codebook."""
    qv = [float(x) for x in query_vec]
    qn = _py_sqrt_norm(qv)
    scored = sorted(((-_py_cosine(qv, qn, c), cid) for cid, c in codebook.items()))
    probe_ids = [cid for _negcos, cid in scored[:n_probe]]
    lit_q = _lit_vec(qv)
    lists = spark.read.parquet(lists_path).filter(F.col("centroid_id").isin(probe_ids))
    if exclude_id is not None:
        lists = lists.filter(F.col(id_col) != exclude_id)
    return (
        lists.select(
            id_col,
            (dot(F.col(vec_col), lit_q) / (F.sqrt(norm_sq(F.col(vec_col))) * F.lit(qn)))
            .cast("double")
            .alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def _sql_kmeans_ctes(
    table: str,
    *,
    n_centroids: int,
    iters: int,
    dim: int,
    id_col: str,
    vec_col: str,
) -> list[str]:
    """Shared CTE chain replaying :func:`kmeans_codebook` + final
    assignment in DuckDB: ``e`` (id, double vec), ``q`` (quantized),
    ``c0..c{iters}`` (training rounds), ``df`` (trained centroid
    doubles), ``af`` (vec_id → centroid_id assignment). Used by the IVF
    and semantic-dedup oracles so both pin the identical training."""
    s = KMEANS_SCALE
    sums = ", ".join(f"CAST(sum(q.vq[{d + 1}]) AS BIGINT)" for d in range(dim))
    cd = f"list_transform(csum, s -> CAST(s AS DOUBLE) / CAST(n * {s} AS DOUBLE))"
    ctes = [
        f"e AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table})",
        f"q AS (SELECT vec_id, v, list_transform(v, x -> CAST(floor(x * {float(s)} + 0.5) AS BIGINT)) AS vq FROM e)",
        f"c0 AS (SELECT vec_id AS centroid_id, vq AS csum, CAST(1 AS BIGINT) AS n FROM q ORDER BY vec_id LIMIT {n_centroids})",
    ]
    for i in range(iters):
        ctes += [
            f"d{i} AS (SELECT centroid_id, {cd} AS cd FROM c{i})",
            f"""a{i} AS (
      SELECT vec_id, centroid_id FROM (
        SELECT q.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sql_cosine('q.v', 'c.cd')} DESC, c.centroid_id) AS rn
        FROM q CROSS JOIN d{i} c
      ) WHERE rn = 1
    )""",
            f"""u{i} AS (
      SELECT a.centroid_id, list_value({sums}) AS csum, count(*) AS n
      FROM a{i} a JOIN q ON a.vec_id = q.vec_id
      GROUP BY a.centroid_id
    )""",
            f"""c{i + 1} AS (
      SELECT c.centroid_id, COALESCE(u.csum, c.csum) AS csum, COALESCE(u.n, c.n) AS n
      FROM c{i} c LEFT JOIN u{i} u ON c.centroid_id = u.centroid_id
    )""",
        ]
    ctes += [
        f"df AS (SELECT centroid_id, {cd} AS cd FROM c{iters})",
        f"""af AS (
      SELECT vec_id, centroid_id FROM (
        SELECT q.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sql_cosine('q.v', 'c.cd')} DESC, c.centroid_id) AS rn
        FROM q CROSS JOIN df c
      ) WHERE rn = 1
    )""",
    ]
    return ctes


def sql_ivf_kmeans(
    table: str,
    query_id: int,
    *,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where_sql: str | None = None,
) -> str:
    """DuckDB twin of k-means codebook + IVF probe + scoring: the same
    quantized integer sums, the same single-division centroid doubles,
    the same argmax/tie-break — so the oracle pins the WHOLE IVF path
    including codebook training, not just the probe.  ``where_sql``
    (a predicate over alias ``tt``, the base table) replays filtered
    retrieval: candidates restricted, codebook/probe unfiltered —
    exactly :func:`cosine_topk_ivf`'s ``where`` contract."""
    ctes = _sql_kmeans_ctes(
        table, n_centroids=n_centroids, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col
    )
    ctes += [
        f"""probe AS (
      SELECT centroid_id FROM (
        SELECT c.centroid_id, {sql_cosine('c.cd', 'qq.v')} AS s
        FROM df c, (SELECT v FROM e WHERE vec_id = {query_id}) qq
        ORDER BY s DESC, c.centroid_id LIMIT {n_probe}
      )
    )""",
    ]
    body = ",\n    ".join(ctes)
    flt = (
        f"JOIN {table} tt ON tt.{id_col} = a.vec_id AND ({where_sql})"
        if where_sql
        else ""
    )
    return f"""
    WITH {body}
    SELECT ev.vec_id, {sql_cosine('ev.v', 'qq.v')} AS cos_sim
    FROM af a
      JOIN probe p ON a.centroid_id = p.centroid_id
      {flt}
      JOIN e ev ON ev.vec_id = a.vec_id,
      (SELECT v FROM e WHERE vec_id = {query_id}) qq
    WHERE ev.vec_id <> {query_id}
    ORDER BY cos_sim DESC, ev.vec_id
    LIMIT {k}
    """


# ------------------------------------------------------------ semantic dedup


def semantic_near_dup(
    embeddings: DataFrame,
    *,
    threshold: float = 0.4,
    n_centroids: int = 8,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_key: str | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup: k-means-cluster the corpus, then
    compare pairs ONLY within a cluster (exact cosine ≥ ``threshold``).

    Scale posture: the pairwise stage is an equi-join on ``centroid_id``
    — with k balanced clusters the candidate work is ~N²/k instead of
    N², and on a cluster each centroid's members co-locate under one
    shuffle key (`repartition(centroid_id)` parquet at 100 TB, exactly
    the IVF list layout — the trained codebook is shared with IVF via
    ``corpus_key``). Approximate by construction: a near-dup pair split
    across cluster boundaries is missed; the oracle replays the same
    clustering so the contract (and its misses) are pinned.
    """
    ck = (corpus_key, n_centroids, kmeans_iters) if corpus_key is not None else None
    codebook = _codebook_cache_get(ck, embeddings.sparkSession)
    if codebook is None:
        codebook = kmeans_codebook(
            embeddings, n_centroids=n_centroids, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
        )
        _codebook_cache_put(ck, codebook, embeddings.sparkSession)
    assigned = ivf_assign(embeddings, codebook, id_col=id_col, vec_col=vec_col)
    # Precompute ‖v‖ ONCE PER ROW before the pair join: cosine() would
    # re-fold both norms per PAIR (O(pairs·dim) instead of O(N·dim) —
    # measured 6.3s → ~2s at sf0.1). sqrt(norm_sq) here is the identical
    # IEEE op sequence cosine() uses, so scores are bit-unchanged and
    # the oracle (which computes norms per pair) still hash-matches.
    withn = assigned.select(
        "centroid_id",
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.sqrt(norm_sq(F.col(vec_col))).alias("_n"),
    )
    a = withn.select(
        "centroid_id",
        F.col("_id").alias("id_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
    )
    b = withn.select(
        "centroid_id",
        F.col("_id").alias("id_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
    )
    return (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos_sim",
            (dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))).cast("double"),
        )
        .filter(F.col("cos_sim") >= F.lit(float(threshold)))
        .select("centroid_id", "id_a", "id_b", "cos_sim")
    )


def sql_semantic_near_dup(
    table: str,
    *,
    threshold: float = 0.4,
    n_centroids: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`semantic_near_dup` — identical k-means
    training/assignment CTEs, then the within-cluster pair join.

    The ``vec_id`` references below are correct for ANY ``id_col``: the
    ``e`` CTE in :func:`_sql_kmeans_ctes` normalizes ``{id_col} AS
    vec_id``, so every downstream CTE (``q``/``af``) and this final
    SELECT operate on the normalized name (verified with a non-default
    ``id_col``)."""
    ctes = _sql_kmeans_ctes(
        table, n_centroids=n_centroids, iters=iters, dim=dim, id_col=id_col, vec_col=vec_col
    )
    body = ",\n    ".join(ctes)
    cos = sql_cosine("e1.v", "e2.v")
    return f"""
    WITH {body}
    SELECT a1.centroid_id, a1.vec_id AS id_a, a2.vec_id AS id_b, {cos} AS cos_sim
    FROM af a1
      JOIN af a2 ON a1.centroid_id = a2.centroid_id AND a1.vec_id < a2.vec_id
      JOIN e e1 ON e1.vec_id = a1.vec_id
      JOIN e e2 ON e2.vec_id = a2.vec_id
    WHERE {cos} >= {float(threshold)}
    """


# ------------------------------------------------------- product quantization


def pq_codebooks(
    embeddings: DataFrame,
    *,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_key: str | None = None,
) -> list[dict[int, list[float]]]:
    """Product-quantization codebooks: the vector is split into ``m``
    contiguous subspaces (dim/m dims each) and an independent
    deterministic k-means (:func:`kmeans_codebook`) is trained per
    subspace on the SLICED corpus.  Returns one {centroid_id: subvector}
    dict per subspace; all the fixed-point replay guarantees carry over
    unchanged because slicing commutes with quantization."""
    sub = dim // m
    books: list[dict[int, list[float]]] = []
    for j in range(m):
        ck = (corpus_key, "pq", j, k_sub, iters) if corpus_key is not None else None
        book = _codebook_cache_get(ck, embeddings.sparkSession)
        if book is None:
            sliced = embeddings.select(
                F.col(id_col), F.slice(F.col(vec_col), j * sub + 1, sub).alias(vec_col)
            )
            book = kmeans_codebook(
                sliced, n_centroids=k_sub, iters=iters, id_col=id_col, vec_col=vec_col
            )
            _codebook_cache_put(ck, book, embeddings.sparkSession)
        books.append(book)
    return books


def cosine_topk_pq(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    m: int = 4,
    k_sub: int = 8,
    kmeans_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_key: str | None = None,
) -> DataFrame:
    """PQ asymmetric top-k → (vec_id, approx_dot): every stored vector
    is replaced by its per-subspace nearest centroid (the PQ code), and
    the score is the dot product of the EXACT query subvectors against
    those reconstructed centroids, summed across subspaces in fixed
    order.  This is the memory-bound ANN design: at 100 TB each vector
    stores m small codes instead of dim floats, and scoring reads the
    codes plus m tiny lookup tables — the classic
    Jégou/Douze/Schmid PQ layout expressed as a pure projection (encode)
    plus an in-order fold (score), no shuffle anywhere.

    Approximate BY CONSTRUCTION (quantization error moves the ranking);
    recall vs the exact brute force is asserted in tests, and the DuckDB
    oracle replays training + encoding + scoring bit-for-bit, so the
    approximation itself is the pinned contract."""
    sub = dim // m
    books = pq_codebooks(
        embeddings,
        m=m,
        k_sub=k_sub,
        iters=kmeans_iters,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        corpus_key=corpus_key,
    )
    qrow = embeddings.filter(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None or any(not b for b in books):
        # empty corpus / unknown query id: empty typed frame (the
        # kmeans_codebook empty-seed guard yields empty books)
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("approx_dot")
        ).limit(0)
    # the single query vector resolves driver-side: each subspace's
    # q_sub · centroid dots become LITERALS folded into the argmax
    # structs (same in-order Python fold the codebook norms use — bit-
    # identical to an engine-side dot).  Without this the when-chain
    # that mapped code → reconstructed centroid re-evaluated the argmax
    # (an interpreted HOF, no CSE) 8× per subspace — measured 8.4s →
    # 3.4s at sf0.1.
    q_vals = [float(x) for x in qrow[0]]

    def pydot(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    scored = embeddings.filter(F.col(id_col) != query_id)
    total = None
    for j, book in enumerate(books):
        sv = F.slice(F.col(vec_col), j * sub + 1, sub)
        qsub = q_vals[j * sub : (j + 1) * sub]
        n_v = F.sqrt(norm_sq(sv))
        entries = []
        for cid, c in sorted(book.items()):
            lit_c = _lit_vec(c)
            cos_k = (dot(sv, lit_c) / (n_v * F.lit(_py_sqrt_norm(c)))).cast("double")
            entries.append(
                F.struct(
                    cos_k.alias("s"),
                    F.lit(float(-cid)).alias("nk"),
                    F.lit(pydot(qsub, c)).alias("dj"),
                )
            )
        dj = F.array_max(F.array(*entries)).getField("dj")
        total = dj if total is None else total + dj
    return (
        scored.select(id_col, total.cast("double").alias("approx_dot"))
        .orderBy(F.desc("approx_dot"), id_col)
        .limit(k)
    )


def sql_pq_topk(
    table: str,
    query_id: int,
    *,
    k: int = 10,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of PQ training + encoding + asymmetric scoring: per
    subspace the same quantized-integer k-means replay as
    :func:`sql_ivf_kmeans`, then score_j = in-order dot of the query
    subvector against the assigned centroid, summed left-to-right
    across subspaces (the same association order as the Spark chain)."""
    s = KMEANS_SCALE
    sub = dim // m
    cd = f"list_transform(csum, x -> CAST(x AS DOUBLE) / CAST(n * {s} AS DOUBLE))"
    ctes = [
        f"e AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table})",
        f"qrow AS (SELECT v AS qv FROM e WHERE vec_id = {query_id})",
    ]
    score_terms = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        p = f"m{j}"
        sums = ", ".join(f"CAST(sum(q.vq[{d + 1}]) AS BIGINT)" for d in range(sub))
        ctes += [
            f"{p}_q AS (SELECT vec_id, v[{lo}:{hi}] AS v, "
            f"list_transform(v[{lo}:{hi}], x -> CAST(floor(x * {float(s)} + 0.5) AS BIGINT)) AS vq FROM e)",
            f"{p}_c0 AS (SELECT vec_id AS centroid_id, vq AS csum, CAST(1 AS BIGINT) AS n "
            f"FROM {p}_q ORDER BY vec_id LIMIT {k_sub})",
        ]
        for i in range(iters):
            ctes += [
                f"{p}_d{i} AS (SELECT centroid_id, {cd} AS cd FROM {p}_c{i})",
                f"""{p}_a{i} AS (
      SELECT vec_id, centroid_id FROM (
        SELECT q.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sql_cosine('q.v', 'c.cd')} DESC, c.centroid_id) AS rn
        FROM {p}_q q CROSS JOIN {p}_d{i} c
      ) WHERE rn = 1
    )""",
                f"""{p}_u{i} AS (
      SELECT a.centroid_id, list_value({sums}) AS csum, count(*) AS n
      FROM {p}_a{i} a JOIN {p}_q q ON a.vec_id = q.vec_id
      GROUP BY a.centroid_id
    )""",
                f"""{p}_c{i + 1} AS (
      SELECT c.centroid_id, COALESCE(u.csum, c.csum) AS csum, COALESCE(u.n, c.n) AS n
      FROM {p}_c{i} c LEFT JOIN {p}_u{i} u ON c.centroid_id = u.centroid_id
    )""",
            ]
        ctes += [
            f"{p}_df AS (SELECT centroid_id, {cd} AS cd FROM {p}_c{iters})",
            f"""{p}_af AS (
      SELECT vec_id, centroid_id FROM (
        SELECT q.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {sql_cosine('q.v', 'c.cd')} DESC, c.centroid_id) AS rn
        FROM {p}_q q CROSS JOIN {p}_df c
      ) WHERE rn = 1
    )""",
            f"""{p}_s AS (
      SELECT a.vec_id,
             {SQL_DOT.format(a=f'qq.qv[{lo}:{hi}]', b='c.cd')} AS sc
      FROM {p}_af a JOIN {p}_df c ON a.centroid_id = c.centroid_id, qrow qq
    )""",
        ]
        score_terms.append(f"m{j}_s.sc")
    joins = " ".join(
        f"JOIN m{j}_s ON m0_s.vec_id = m{j}_s.vec_id" for j in range(1, m)
    )
    total = " + ".join(score_terms)
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT m0_s.vec_id AS vec_id, CAST({total} AS DOUBLE) AS approx_dot
    FROM m0_s {joins}
    WHERE m0_s.vec_id <> {query_id}
    ORDER BY approx_dot DESC, vec_id
    LIMIT {k}"""
    )


def cosine_topk_pq_rerank(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    k_sub: int = 8,
    kmeans_iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_key: str | None = None,
) -> DataFrame:
    """Two-stage PQ retrieval → (vec_id, cos_sim): PQ scores the whole
    corpus from codes alone (stage 1, memory-bound, never touches raw
    vectors), then ONLY the ``shortlist`` candidates are re-ranked with
    the exact cosine against raw vectors (stage 2).  Measured on the
    synthetic corpus: a 10%-of-corpus shortlist recovers 8/10 of the
    exact top-10 where direct PQ ranking alone recalls 3/10 (SCALE.md).
    This is the production retrieval shape; the exact arithmetic of
    both stages is oracle-replayed."""
    cand = cosine_topk_pq(
        embeddings,
        query_id,
        k=shortlist,
        m=m,
        k_sub=k_sub,
        kmeans_iters=kmeans_iters,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
        corpus_key=corpus_key,
    ).select(id_col)
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    return (
        embeddings.join(F.broadcast(cand), id_col, "left_semi")
        .crossJoin(F.broadcast(q))
        .select(id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )


def sql_pq_rerank(
    table: str,
    query_id: int,
    *,
    k: int = 10,
    shortlist: int = 50,
    m: int = 4,
    k_sub: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of the two-stage retrieval: the full PQ replay as a
    derived table, exact cosine re-rank over the shortlist."""
    inner = sql_pq_topk(
        table,
        query_id,
        k=shortlist,
        m=m,
        k_sub=k_sub,
        iters=iters,
        dim=dim,
        id_col=id_col,
        vec_col=vec_col,
    )
    return f"""
    SELECT e.{id_col} AS vec_id,
           {sql_cosine(f'e.{vec_col}', 'qq.qv')} AS cos_sim
    FROM {table} e
      JOIN ({inner}) cand ON e.{id_col} = cand.vec_id,
      (SELECT {vec_col}::DOUBLE[] AS qv FROM {table} WHERE {id_col} = {query_id}) qq
    ORDER BY cos_sim DESC, vec_id
    LIMIT {k}"""


# ----------------------------------------------------- retrieval quality


def knn_join_lsh_multiprobe(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    bits: int = 8,
    query_id_col: str = "query_id",
    corpus_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch ANN join: every query scores only its sign-LSH bucket plus
    the ``bits`` hamming-1 probe buckets — the batch twin of
    :func:`cosine_topk_lsh_multiprobe`.  Queries (with their probe
    fan-out, |Q|·(bits+1) rows) broadcast; the corpus never shuffles;
    per-query top-k is the shared window tail.  Ids drawn from the
    corpus namespace are excluded from their own neighbor lists."""
    b = corpus.select(
        F.col(corpus_id_col).alias("vec_id"),
        F.col(vec_col).alias("_cv"),
        sign_bucket(F.col(vec_col), bits).alias("_bkt"),
    )
    q = queries.select(
        F.col(query_id_col).alias("_qid"),
        F.col(vec_col).alias("_qv"),
        sign_bucket(F.col(vec_col), bits).alias("_qbkt"),
    )
    probe_arr = F.array(F.col("_qbkt"), *[_flip_bit(F.col("_qbkt"), i, bits) for i in range(bits)])
    probes = q.select("_qid", "_qv", F.explode(probe_arr).alias("_pb"))
    scored = (
        b.join(F.broadcast(probes), F.col("_bkt") == F.col("_pb"))
        .filter(F.col("vec_id") != F.col("_qid"))
        .select(
            F.col("_qid").alias(query_id_col),
            "vec_id",
            cosine(F.col("_cv"), F.col("_qv")).alias("cos_sim"),
        )
    )
    return _topk_per_query(scored, k, query_id_col)


def recall_at_k(
    approx: DataFrame, exact: DataFrame, n_queries_df: DataFrame, *, k: int,
    query_id_col: str = "query_id",
) -> DataFrame:
    """Measured retrieval quality — recall@k of an ANN result against
    the exact top-k, as a one-row DataFrame
    ``(n_queries, k, n_hits, recall)``.  The denominator is
    ``n_queries·k`` (queries with fewer than k approx hits count their
    misses), so the number is honest about empty buckets."""
    hits = approx.select(query_id_col, "vec_id").join(
        exact.select(query_id_col, "vec_id"), [query_id_col, "vec_id"]
    )
    # one tall union + one aggregation — no 1×1 join at all (a lit-key
    # equi-join constant-folds to always-true and plans as a nested
    # loop, which the plan audit rightly flags)
    tall = n_queries_df.select(F.lit("q").alias("_k")).unionByName(
        hits.select(F.lit("h").alias("_k"))
    )
    counts = tall.agg(
        F.count(F.when(F.col("_k") == "q", 1)).cast("long").alias("n_queries"),
        F.count(F.when(F.col("_k") == "h", 1)).cast("long").alias("n_hits"),
    )
    return counts.select(
        "n_queries",
        F.lit(k).cast("long").alias("k"),
        "n_hits",
        F.round(F.col("n_hits") / (F.col("n_queries") * k), 4).alias("recall"),
    )


def sql_recall_lsh_multiprobe(
    table: str, query_filter: str, *, k: int = 10, bits: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    """DuckDB twin of the LSH-multiprobe recall@k measurement: replays
    the banded probe join AND the exact baseline, so the recall number
    itself — approximation misses included — is oracle-pinned."""
    flips = ", ".join(
        f"substr(q.bkt, 1, {i}) || (CASE WHEN substr(q.bkt, {i + 1}, 1) = '1' "
        f"THEN '0' ELSE '1' END) || substr(q.bkt, {i + 2})"
        for i in range(bits)
    )
    cos_lsh = sql_cosine("c.v", "p.v")
    cos_exact = sql_cosine("c.v", "q.v")
    return f"""
    WITH e AS (
      SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v,
             {sql_sign_bucket(vec_col, bits)} AS bkt
      FROM {table}
    ),
    q AS (SELECT vec_id AS qid, v, bkt FROM e
          WHERE vec_id IN (SELECT {id_col} FROM {table} WHERE {query_filter})),
    probes AS (SELECT qid, v, t.pb FROM q, unnest([q.bkt, {flips}]) AS t(pb)),
    lsh AS (
      SELECT qid, vec_id FROM (
        SELECT p.qid, c.vec_id,
               row_number() OVER (PARTITION BY p.qid
                                  ORDER BY {cos_lsh} DESC, c.vec_id) AS rnk
        FROM e c JOIN probes p ON c.bkt = p.pb
        WHERE c.vec_id <> p.qid
      ) t WHERE rnk <= {k}
    ),
    exact AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, c.vec_id,
               row_number() OVER (PARTITION BY q.qid
                                  ORDER BY {cos_exact} DESC, c.vec_id) AS rnk
        FROM e c CROSS JOIN q
        WHERE c.vec_id <> q.qid
      ) t WHERE rnk <= {k}
    ),
    counts AS (
      SELECT (SELECT count(*) FROM q) AS nq,
             (SELECT count(*) FROM lsh JOIN exact USING (qid, vec_id)) AS nh
    )
    SELECT CAST(nq AS BIGINT) AS n_queries, CAST({k} AS BIGINT) AS k,
           CAST(nh AS BIGINT) AS n_hits,
           round(CAST(nh AS DOUBLE) / (nq * {k}), 4) AS recall
    FROM counts
    """
