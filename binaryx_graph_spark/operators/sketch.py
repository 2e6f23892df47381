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
