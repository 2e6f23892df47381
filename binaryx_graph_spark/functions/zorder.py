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
