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

# u64::MAX — the reference parses with Rust u64::from_str_radix, so the
# valid range is the FULL unsigned 64-bit range. A signed `long` column
# cannot hold 0xffffffff81000000-style high-half addresses (>= 2^63);
# we carry the value as decimal(20,0) instead and never round-trip
# through a signed long.
_U64_MAX_DEC = "18446744073709551615"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _hex_fits_u64(h: Column) -> Column:
    """True iff hex-digit string `h` is <= u64::MAX (<= 16 significant digits)."""
    return F.length(F.regexp_replace(h, "^0+", "")) <= 16


def _dec_fits_u64(d: Column) -> Column:
    """True iff decimal-digit string `d` is <= u64::MAX."""
    s = F.regexp_replace(d, "^0+", "")
    return (F.length(s) < 20) | ((F.length(s) == 20) & (s <= F.lit(_U64_MAX_DEC)))


def parse_address(col: str | Column) -> Column:
    """String address (0x-hex | decimal | bare hex) → nullable decimal(20,0).

    Full-u64 range: values >= 2^63 (kernel/high-half addresses) parse
    exactly; out-of-range inputs yield null exactly as Rust's
    u64::from_str_radix does. `F.conv` is unsigned-64 internally and the
    range guards keep it from ever overflowing (which would throw under
    ANSI mode). A decimal string that overflows u64 falls through to the
    bare-hex attempt, mirroring the reference's parse order.
    """
    t = F.trim(_c(col))
    hex_body = F.regexp_replace(t, "^0[xX]", "")
    hex_val = F.when(_hex_fits_u64(hex_body), F.conv(hex_body, 16, 10).cast("decimal(20,0)"))
    dec_val = F.when(_dec_fits_u64(t), t.cast("decimal(20,0)"))
    bare_val = F.when(_hex_fits_u64(t), F.conv(t, 16, 10).cast("decimal(20,0)"))
    return (
        F.when(t.rlike(_HEX_PREFIXED), hex_val)
        .when(t.rlike(_DECIMAL), F.coalesce(dec_val, bare_val))
        .when(t.rlike(_BARE_HEX), bare_val)
        .otherwise(F.lit(None).cast("decimal(20,0)"))
    )


def format_address(col: str | Column) -> Column:
    """u64 (decimal(20,0) or long) → canonical '0x{:x}' string (null-propagating).

    Uses conv(·,10,16) rather than hex() so full-u64 decimals format
    without a signed-long cast.
    """
    n = _c(col)
    return F.when(n.isNotNull(), F.concat(F.lit("0x"), F.lower(F.conv(n.cast("string"), 10, 16))))


def normalize_address(col: str | Column) -> Column:
    """format ∘ parse — canonical form, null where unparseable."""
    return format_address(parse_address(col))


# ------------------------------------------------- driver-side twins
#
# For resolving ONE user-supplied scalar (e.g. the xref query address)
# there is no reason to launch a Spark job: these pure-Python twins
# implement the identical semantics (pinned against the Column versions
# in tests/test_scalars.py).

_U64_MAX = (1 << 64) - 1


def parse_address_py(s: str | None) -> int | None:
    """Python twin of :func:`parse_address` — same branch order, same
    full-u64 range, same overflow → None behavior."""
    if s is None:
        return None
    t = s.strip()
    if not t:
        return None
    if t[0] == "0" and len(t) > 1 and t[1] in "xX":
        body = t[2:]
        if body and all(c in "0123456789abcdefABCDEF" for c in body):
            v = int(body, 16)
            return v if v <= _U64_MAX else None
        return None
    if t.isascii() and t.isdigit():
        v = int(t)
        if v <= _U64_MAX:
            return v
        # decimal overflow falls through to the bare-hex attempt
    if all(c in "0123456789abcdefABCDEF" for c in t):
        v = int(t, 16)
        return v if v <= _U64_MAX else None
    return None


def normalize_address_py(s: str | None) -> str | None:
    """Python twin of :func:`normalize_address`."""
    v = parse_address_py(s)
    return None if v is None else f"0x{v:x}"
