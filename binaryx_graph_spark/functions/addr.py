"""Address parsing/normalization (reference: /root/reference/src/utils/uid.rs:8-46).

Pure Column expressions — no UDFs — so Catalyst keeps them inside
whole-stage codegen and they vectorize over billions of rows.

Reference semantics (pinned by tests at uid.rs:52-83):
  parse_address(s):
    1. trim; empty → null
    2. '0x'/'0X' prefix → parse remainder as hex
    3. else try decimal
    4. else try bare hex
    5. otherwise null
  format_address(n) = '0x' + lowercase hex
  normalize_address = format ∘ parse (null where unparseable; callers keep
  the raw form as a fallback join key, src/api/session.rs:487-492)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX_PREFIXED = r"^0[xX][0-9a-fA-F]+$"
_DECIMAL = r"^[0-9]+$"
_BARE_HEX = r"^[0-9a-fA-F]+$"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_address(col: str | Column) -> Column:
    """String address (0x-hex | decimal | bare hex) → nullable long."""
    t = F.trim(_c(col))
    return (
        F.when(t.rlike(_HEX_PREFIXED), F.conv(F.regexp_replace(t, "^0[xX]", ""), 16, 10).cast("long"))
        .when(t.rlike(_DECIMAL), t.cast("long"))
        .when(t.rlike(_BARE_HEX), F.conv(t, 16, 10).cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )


def format_address(col: str | Column) -> Column:
    """long → canonical '0x{:x}' string (null-propagating)."""
    n = _c(col)
    return F.when(n.isNotNull(), F.concat(F.lit("0x"), F.lower(F.hex(n))))


def normalize_address(col: str | Column) -> Column:
    """format ∘ parse — canonical form, null where unparseable."""
    return format_address(parse_address(col))
