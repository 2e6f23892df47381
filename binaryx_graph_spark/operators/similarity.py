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
    embeddings: DataFrame, query_id: int, *, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force cosine top-k against one stored vector →
    (vec_id, cos_sim), excluding the query row, ties broken on id."""
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec")
    )
    return (
        embeddings.crossJoin(F.broadcast(q))
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


def ivf_assign(
    embeddings: DataFrame,
    *,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization with FIXED centroids: the first
    ``n_centroids`` stored vectors (by id) act as the coarse codebook —
    deterministic, so the oracle can reproduce the assignment. A
    production build would k-means the codebook; the partition/probe
    dataflow is identical. → (vec_id, embedding, centroid_id)"""
    from pyspark.sql.window import Window

    cents = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec"))
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        id_col,
        vec_col,
        "centroid_id",
        cosine(F.col(vec_col), F.col("_cvec")).alias("_csim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_csim"), "centroid_id")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    query_id: int,
    *,
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat ANN: score only vectors whose centroid is among the
    query's ``n_probe`` nearest centroids. At scale the lists are
    ``repartition(centroid_id)``-ed parquet partitions and a probe
    touches n_probe/n_centroids of the data."""
    from pyspark.sql.window import Window

    assigned = ivf_assign(embeddings, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col)
    cents = (
        embeddings.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("_cvec"))
    )
    q = embeddings.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("_qvec"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("centroid_id", cosine(F.col("_cvec"), F.col("_qvec")).alias("_csim"))
        .orderBy(F.desc("_csim"), "centroid_id")
        .limit(n_probe)
        .select("centroid_id")
    )
    return (
        assigned.join(F.broadcast(probe), "centroid_id", "left_semi")
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), id_col)
        .limit(k)
    )
