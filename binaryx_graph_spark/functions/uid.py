"""Global-dedup UID scheme (reference: /root/reference/src/models/nodes.rs:56-103,
src/utils/uid.rs:3-6; scheme table in SURVEY.md §1.1).

All SHA-256 via the built-in ``F.sha2`` — bit-identical to the reference's
sha2 crate output (pinned vectors in tests/test_scalars.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .addr import format_address, parse_address


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_trailing_nuls(col: str | Column) -> Column:
    """Trim trailing NUL bytes before hashing (nodes.rs:96)."""
    return F.regexp_replace(_c(col), "\x00+$", "")


def string_uid(value: str | Column) -> Column:
    """'str:' + sha256(value after NUL-trim) — global scope (nodes.rs:93-103)."""
    return F.concat(F.lit("str:"), F.sha2(strip_trailing_nuls(value), 256))


def function_uid(binary_hash: str | Column, address: str | Column) -> Column:
    """'{binary_hash}:0x{addr:x}' — per-binary scope (nodes.rs:56-69).

    Address is normalized; unparseable input falls back to 0x0 (the
    reference parses with default 0, src/api/session.rs:335-340).
    """
    addr = F.coalesce(format_address(parse_address(address)), F.lit("0x0"))
    return F.concat(_c(binary_hash), F.lit(":"), addr)


def import_uid(library: str | Column, name: str | Column) -> Column:
    """'imp:{library_lower}:{name}' — GLOBAL scope: the same imported API is
    one node shared across all binaries (nodes.rs:71-82)."""
    return F.concat(F.lit("imp:"), F.lower(_c(library)), F.lit(":"), _c(name))


def library_uid(name: str | Column) -> Column:
    """lowercased library name (nodes.rs:137-141)."""
    return F.lower(_c(name))
