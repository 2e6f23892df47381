"""Scalar kernel vs the reference's pinned vectors
(/root/reference/src/utils/uid.rs:48-111; FIXTURES.md §4)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.functions.addr import format_address, normalize_address, parse_address
from binaryx_graph_spark.functions.uid import function_uid, import_uid, string_uid


def _eval(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _parse(spark, s):
    return _eval(spark, parse_address(F.lit(s)))


def test_parse_address_hex_prefixed(spark):
    assert _parse(spark, "0x1000") == 4096
    assert _parse(spark, "0X1000") == 4096
    assert _parse(spark, "0x00001000") == 4096


def test_parse_address_decimal(spark):
    assert _parse(spark, "4096") == 4096
    assert _parse(spark, "0") == 0


def test_parse_address_bare_hex(spark):
    assert _parse(spark, "abcd") == 43981
    assert _parse(spark, "ABCD") == 43981
    # decimal wins over hex interpretation for digit-only strings
    assert _parse(spark, "1000") == 1000


def test_parse_address_invalid(spark):
    assert _parse(spark, "") is None
    assert _parse(spark, "   ") is None
    assert _parse(spark, "xyz") is None
    assert _parse(spark, "0x") is None


def test_parse_address_trims(spark):
    assert _parse(spark, "  0x1000  ") == 4096


def test_parse_address_full_u64_range(spark):
    # High-half / kernel addresses >= 2^63 must survive (reference parses u64,
    # not i64 — ADVICE r1 high finding).
    assert _parse(spark, "0xffffffff81000000") == 0xFFFFFFFF81000000
    assert _parse(spark, "0x8000000000000000") == 2**63
    assert _parse(spark, "0xffffffffffffffff") == 2**64 - 1
    assert _parse(spark, "18446744073709551615") == 2**64 - 1  # u64::MAX decimal
    # overflow: >16 significant hex digits / > u64::MAX decimal → null,
    # exactly as Rust u64::from_str_radix errors
    assert _parse(spark, "0x10000000000000000") is None
    assert _parse(spark, "0x0ffffffffffffffff") == 2**64 - 1  # leading zeros don't count
    assert _parse(spark, "18446744073709551616") is None  # 2^64: dec overflow, 20 hex digits too


def test_format_address(spark):
    assert _eval(spark, format_address(F.lit(4096))) == "0x1000"
    assert _eval(spark, format_address(F.lit(0))) == "0x0"


def test_normalize_full_u64(spark):
    assert _eval(spark, normalize_address(F.lit("0XFFFFFFFF81000000"))) == "0xffffffff81000000"
    assert _eval(spark, normalize_address(F.lit("18446744073709551615"))) == "0xffffffffffffffff"
    assert _eval(spark, normalize_address(F.lit("0x10000000000000000"))) is None


def test_normalize_roundtrip(spark):
    assert _eval(spark, normalize_address(F.lit("0X00001000"))) == "0x1000"
    assert _eval(spark, normalize_address(F.lit("4096"))) == "0x1000"
    assert _eval(spark, normalize_address(F.lit("xyz"))) is None


def test_normalize_address_py_twin(spark):
    """The driver-side Python twin must agree with the Column kernel on
    every branch: hex-prefixed, decimal, bare hex, overflow, garbage."""
    from binaryx_graph_spark.functions.addr import normalize_address_py

    vectors = [
        "0x1000", "0X1000", "0x00001000", "4096", "0", "1000", "abcd", "ABCD",
        "", "   ", "xyz", "0x", "  0x1000  ",
        "0xffffffff81000000", "0x8000000000000000", "0xffffffffffffffff",
        "18446744073709551615", "18446744073709551616", "0x10000000000000000",
        "0x0ffffffffffffffff", "deadBEEF", "0xg", "12 34", "-5", "0x-5",
    ]
    rows = spark.createDataFrame([(v,) for v in vectors], "s string").select(
        "s", normalize_address(F.col("s")).alias("norm")
    ).collect()
    col_result = {r["s"]: r["norm"] for r in rows}
    for v in vectors:
        assert normalize_address_py(v) == col_result[v], v


def test_string_uid_pinned_sha256(spark):
    assert (
        _eval(spark, string_uid(F.lit("Hello")))
        == "str:185f8db32271fe25f561a6fc938b2e264306ec304eda518007d1764826381969"
    )
    assert (
        _eval(spark, string_uid(F.lit("")))
        == "str:e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    )
    # trailing NULs stripped before hashing
    assert _eval(spark, string_uid(F.lit("Hello\x00\x00"))) == _eval(
        spark, string_uid(F.lit("Hello"))
    )


def test_function_uid(spark):
    assert _eval(spark, function_uid(F.lit("aaaa"), F.lit("0x401000"))) == "aaaa:0x401000"
    assert _eval(spark, function_uid(F.lit("aaaa"), F.lit("4198400"))) == "aaaa:0x401000"
    assert _eval(spark, function_uid(F.lit("aaaa"), F.lit("bogus"))) == "aaaa:0x0"


def test_import_uid(spark):
    assert _eval(spark, import_uid(F.lit("KERNEL32"), F.lit("CreateFileA"))) == "imp:kernel32:CreateFileA"
