"""Z-order (Morton) interleaving for multi-dimensional data layout.

Why: at 100 TB, sorting a fact table by ONE key gives file-level min/max
pruning on that key only. Interleaving the bits of two keys and sorting
by the interleaved value clusters BOTH dimensions at once — every
z-bucket (file) covers a small rectangle of (dim1, dim2), so parquet
min/max statistics prune files for predicates on EITHER dimension.
This is the layout trick behind Delta/Iceberg OPTIMIZE ZORDER; here it
is a pure Column expression (shift/mask/sum — whole-stage codegen, no
UDF) plus a DuckDB SQL twin so the math is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton2(x: Column, y: Column, *, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of x (even positions) and y (odd
    positions) → z-value in [0, 4^bits). Inputs must be non-negative."""
    terms = []
    for b in range(bits):
        terms.append(F.shiftright(x.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b)))
        terms.append(
            F.shiftright(y.cast("long"), b).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * b + 1))
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def sql_morton2(x: str, y: str, *, bits: int = 8) -> str:
    """DuckDB twin of :func:`morton2` (same shift/mask/sum)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x}) >> {b}) & 1) * {1 << (2 * b)}")
        terms.append(f"((({y}) >> {b}) & 1) * {1 << (2 * b + 1)}")
    return "(" + " + ".join(terms) + ")"


def zvalue(df, cols, *, bits: int = 8) -> Column:
    """Quantized 2-D z-value for ``df``'s numeric ``cols`` — the
    OPTIMIZE ZORDER key.  Each column is linearly width-bucketed into
    ``2^bits`` bins between its observed min/max (one tiny agg job for
    the bounds — metadata-light, the same pass Delta's zorder pays),
    then the bin ids interleave via :func:`morton2`.  Sorting files by
    this value makes every file's zone map a small RECTANGLE in
    (cols[0], cols[1]), so min/max skipping prunes on EITHER dimension.

    Linear bucketing (not quantile) is the documented tradeoff: heavy
    skew in a dimension concentrates its bins, weakening pruning on it
    — acceptable for a layout lever; pre-transform the column upstream
    if its distribution is pathological."""
    if len(cols) != 2:
        raise ValueError(f"zvalue interleaves exactly 2 columns, got {cols}")
    row = df.agg(
        *[F.min(c).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(c).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    n_bins = 1 << bits
    bucketed = []
    for i, c in enumerate(cols):
        mn, mx = row[f"__mn_{i}"], row[f"__mx_{i}"]
        if mn is None:  # empty input: any constant works
            bucketed.append(F.lit(0))
            continue
        span = float(mx) - float(mn)
        if span <= 0:
            bucketed.append(F.lit(0))
            continue
        b = ((F.col(c).cast("double") - float(mn)) / span * n_bins).cast("long")
        bucketed.append(F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b)))
    return morton2(bucketed[0], bucketed[1], bits=bits)
