"""Count-Min Sketch as a distributed, mergeable DataFrame operator.

The sketch IS a table: (d, bucket, cnt) with depth×width cells. Building
it is one map-side-combinable groupBy (the d hash rows explode from an
inline array — no shuffle blowup: d·|input| rows collapse to d·width
cells); merging two sketches is a unionByName + re-groupBy; estimating
is a min over d of the matched cells — all stock DataFrame ops, fully
distributed, no driver state.

The bucket hash is sha256-based (first 4 hex digits of sha256("d:key"),
mod width) so DuckDB recomputes the IDENTICAL sketch — the correctness
gate pins not just the dataflow but the estimates themselves. The
classic CMS guarantee holds: est ≥ true, est ≤ true + (e/width)·N with
prob 1-e^-depth; accuracy at the test corpus is asserted in
tests/test_sketch.py.

100 TB posture: the sketch is depth×width cells regardless of input
size; partial aggregation means each executor ships at most d·width
rows to the final combine. This is the pattern for heavy-hitter /
frequency estimation where exact per-key counts would shuffle the
whole corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 256

_HEX = "0123456789abcdef"


def _bucket(key: Column, d: int, width: int) -> Column:
    """Row d's bucket for a key: first 16 bits of sha256('d:'||key) mod width."""
    h4 = F.substring(F.sha2(F.concat(F.lit(f"{d}:"), key.cast("string")), 256), 1, 4)
    return (F.conv(h4, 16, 10).cast("long") % width).alias(f"b{d}")


def sql_bucket(key: str, d: int, width: int) -> str:
    """DuckDB twin of :func:`_bucket` (no conv() there — positional hex)."""
    h = f"sha256('{d}:' || CAST({key} AS VARCHAR))"
    val = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {i}, 1)) - 1) * {16 ** (4 - i)}" for i in range(1, 5)
    )
    return f"(({val}) % {width})"


def cms_build(
    df: DataFrame, key: Column, *, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Build the sketch table → (d, bucket, cnt). One explode of a
    depth-length inline array, then a map-side-combinable groupBy over
    at most depth×width groups."""
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width).alias("bucket"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, *, depth: int = DEPTH, width: int = WIDTH
) -> DataFrame:
    """Point estimates for each key row → (key_col, est). est = min over
    d of the key's cell; the sketch side is depth×width cells →
    broadcast; absent cells count 0 (key never seen)."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _bucket(F.col(key_col), d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, F.col("p.d").alias("d"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def sql_cms_estimate(
    table: str, key_expr: str, probe_keys_sql: str, key_name: str, *, depth: int = DEPTH, width: int = WIDTH
) -> str:
    """DuckDB twin: identical sketch + identical min-over-rows estimate.
    ``probe_keys_sql`` is a subquery yielding one column named ``key_name``."""
    cell_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {sql_bucket(key_expr, d, width)} AS bucket FROM {table}"
        for d in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT {key_name}, {d} AS d, {sql_bucket(key_name, d, width)} AS bucket FROM probe_keys"
        for d in range(depth)
    )
    return f"""
    WITH cells AS ({cell_rows}),
    sk AS (SELECT d, bucket, count(*) AS cnt FROM cells GROUP BY d, bucket),
    probe_keys AS ({probe_keys_sql}),
    probes AS ({probe_rows})
    SELECT p.{key_name},
           CAST(min(COALESCE(sk.cnt, 0)) AS BIGINT) AS est
    FROM probes p LEFT JOIN sk ON p.d = sk.d AND p.bucket = sk.bucket
    GROUP BY p.{key_name}
    """


# ------------------------------------------------------------------ HLL

HLL_M = 64  # registers (2^6); standard alpha for m=64
HLL_ALPHA = 0.709


def hll_registers(df: DataFrame, key: Column) -> DataFrame:
    """HyperLogLog register table → (reg, m_val), built deterministically
    from sha256 so DuckDB reproduces the IDENTICAL registers.

    reg  = first 16 hash bits mod 64; rho = position of the highest set
    bit in the next 52 bits (53 when they are all zero).  One map-side-
    combinable max-groupBy over ≤64 groups — constant-size state, the
    mergeable-sketch property that makes approx-distinct feasible at
    100 TB (executors each ship ≤64 rows).
    """
    h = F.sha2(key.cast("string"), 256)
    reg = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % HLL_M
    v52 = F.conv(F.substring(h, 5, 13), 16, 10).cast("long")
    rho = F.when(v52 == 0, F.lit(53)).otherwise(F.lit(53) - F.length(F.bin(v52)))
    return (
        df.select(reg.alias("reg"), rho.cast("long").alias("rho"))
        .groupBy("reg")
        .agg(F.max("rho").alias("m_val"))
    )


def hll_estimate(spark, registers: DataFrame) -> DataFrame:
    """Raw HLL estimate as a 1-row DataFrame → (hll_estimate DOUBLE).

    The harmonic sum Σ 2^-M[j] is computed EXACTLY: each term scaled to
    the integer 2^(53-M[j]) (M ≤ 53 → no overflow at m·2^53 < 2^63),
    summed as int64 — order-independent, so Spark and DuckDB agree
    bit-for-bit.  The estimate applies α·m² with ONE float division.
    No small-range (linear-counting) correction on either side — the
    raw estimator is the pinned contract (documented divergence from
    the paper's piecewise form; both engines share it).
    """
    allregs = spark.range(HLL_M).select(F.col("id").alias("reg"))
    padded = allregs.join(registers, "reg", "left").select(
        F.coalesce(F.col("m_val"), F.lit(0)).alias("m0")
    )
    s = F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - m0 AS INT))")).alias("s")
    return padded.agg(
        (F.lit(HLL_ALPHA) * F.lit(float(HLL_M * HLL_M)) * F.lit(float(1 << 53)) / s)
        .alias("hll_estimate")
    )


def sql_hll_estimate(table: str, key_expr: str) -> str:
    """DuckDB twin of registers+estimate: identical hash slicing, bin()
    bit-length rho, exact integer harmonic sum, same single division."""
    h = f"sha256(CAST({key_expr} AS VARCHAR))"
    hex4 = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {i}, 1)) - 1) * {16 ** (4 - i)}" for i in range(1, 5)
    )
    hex13 = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {i}, 1)) - 1) * {16 ** (17 - i)}" for i in range(5, 18)
    )
    return f"""
    WITH hashed AS (
      SELECT ({hex4}) % {HLL_M} AS reg,
             CAST({hex13} AS BIGINT) AS v52
      FROM {table}
    ),
    regs AS (
      SELECT reg,
             max(CASE WHEN v52 = 0 THEN 53 ELSE 53 - length(bin(v52)) END) AS m_val
      FROM hashed GROUP BY reg
    ),
    padded AS (
      SELECT COALESCE(r.m_val, 0) AS m0
      FROM range({HLL_M}) t(reg) LEFT JOIN regs r ON r.reg = t.reg
    )
    SELECT CAST({HLL_ALPHA} AS DOUBLE) * CAST({HLL_M * HLL_M} AS DOUBLE)
             * CAST({1 << 53} AS DOUBLE)
             / CAST(sum(CAST(1 AS BIGINT) << CAST(53 - m0 AS INTEGER)) AS BIGINT)
           AS hll_estimate
    FROM padded
    """


# ----------------------------------------------------------------- drift

#: 2^-20 quantization of per-bin PSI contributions (log base 2 — see
#: queries/analytics_ext.events_drift_psi for the libm-equivalence
#: contract that makes base-2 oracle-replayable and ln() not).
PSI_SCALE = 1 << 20


def drift_psi(
    df: DataFrame, bin_col: str, cur_col: str, *, n_bins: int = 10, scale: int = PSI_SCALE
) -> DataFrame:
    """Population Stability Index between two slices of one frame →
    (bin, ref_n, cur_n, psi_q_bits): ``bin_col`` an integer bin id in
    [0, n_bins), ``cur_col`` 0 for the reference slice / 1 for the
    current one.  Counting stage here; scoring in
    :func:`drift_psi_from_counts` (shared with the streaming twin,
    whose state IS the counts frame).

    Plan: ONE partial-agg shuffle on ≤ n_bins keys, then the
    counts-level scorer."""
    counts_raw = df.groupBy(F.col(bin_col).alias("bin")).agg(
        F.sum(F.when(F.col(cur_col) == 0, 1).otherwise(0)).cast("long").alias("ref_n"),
        F.sum(F.when(F.col(cur_col) == 1, 1).otherwise(0)).cast("long").alias("cur_n"),
    )
    return drift_psi_from_counts(counts_raw, n_bins=n_bins, scale=scale)


def drift_psi_from_counts(
    counts_raw: DataFrame, *, n_bins: int = 10, scale: int = PSI_SCALE
) -> DataFrame:
    """PSI scorer over a per-bin count frame (bin, ref_n, cur_n)
    covering any SUBSET of [0, n_bins) — spine-completes missing bins
    to zero, add-one smoothing keeps them finite, per-bin contribution
    (cur% − ref%)·log2(cur%/ref%) quantized to 1/``scale`` bits.

    The log2 runs ONCE per bin on the driver over exact integer-count
    ratios (libm-equivalent to the DuckDB twin's log2 on this domain;
    see queries/analytics_ext.events_drift_psi) and broadcast-joins
    back into the distributed count spine.  Total PSI =
    Σ psi_q_bits / scale; the monitoring convention flags > 0.1
    (ln-based) ≈ 0.144 bits."""
    import math

    spark = counts_raw.sparkSession
    spine = spark.range(n_bins).select(F.col("id").alias("bin"))
    # FULL join (not left): an out-of-[0, n_bins) bin id must surface so
    # it can be rejected loudly below — a left join would silently drop
    # it from the result AND from the rt/ct totals, skewing every other
    # bin's percentage (ADVICE r6).  Callers clamp at binning time; this
    # is the backstop for a mis-binned caller.
    counts = (
        spine.join(counts_raw, "bin", "full")
        .select(
            "bin",
            F.coalesce("ref_n", F.lit(0)).cast("long").alias("ref_n"),
            F.coalesce("cur_n", F.lit(0)).cast("long").alias("cur_n"),
        )
        .localCheckpoint(eager=True)  # reused: collected for the driver
        # PSI table AND returned as the result spine
    )
    rows = counts.collect()  # n_bins rows + any out-of-range strays
    bad = [r["bin"] for r in rows if r["bin"] is None or not 0 <= r["bin"] < n_bins]
    if bad:
        raise ValueError(
            f"bin ids outside [0, {n_bins}): {bad[:10]} — clamp or re-bin upstream"
        )
    rt = sum(r["ref_n"] for r in rows)
    ct = sum(r["cur_n"] for r in rows)
    lit = [
        (
            r["bin"],
            int(
                math.floor(
                    (
                        (r["cur_n"] + 1) / (ct + n_bins)
                        - (r["ref_n"] + 1) / (rt + n_bins)
                    )
                    * math.log2(
                        ((r["cur_n"] + 1) * (rt + n_bins))
                        / ((r["ref_n"] + 1) * (ct + n_bins))
                    )
                    * scale
                    + 0.5
                )
            ),
        )
        for r in rows
    ]
    psi = spark.createDataFrame(lit, "bin long, psi_q_bits long")
    return counts.join(F.broadcast(psi), "bin").orderBy("bin")
