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


def test_format_address(spark):
    assert _eval(spark, format_address(F.lit(4096))) == "0x1000"
    assert _eval(spark, format_address(F.lit(0))) == "0x0"


def test_normalize_roundtrip(spark):
    assert _eval(spark, normalize_address(F.lit("0X00001000"))) == "0x1000"
    assert _eval(spark, normalize_address(F.lit("4096"))) == "0x1000"
    assert _eval(spark, normalize_address(F.lit("xyz"))) is None


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
