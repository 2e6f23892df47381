"""PII redaction: placeholder substitution, multi-hit docs, clean docs."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from binaryx_graph_spark.operators.textstats import pii_redact


def test_pii_redact_replaces_each_kind(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.org today"),
            (2, "server 192.168.1.250 and 10.0.0.7 are up"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "call +1-555-123-4567 now"),
            (5, "totally clean text"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert got[1]["redacted_text"] == "mail me at <EMAIL> today"
    assert got[2]["redacted_text"] == "server <IPV4> and <IPV4> are up"
    # SSN pattern applies after phone; phone needs [-. ] separated groups
    # of 3/3+ digits, so 123-45-6789 is NOT phone-shaped and lands in SSN
    assert got[3]["redacted_text"] == "ssn <SSN_LIKE> leaked"
    assert got[4]["redacted_text"] == "call <PHONE> now"
    assert got[5]["redacted_text"] == "totally clean text"
    assert got[5]["redacted"] is False and got[1]["redacted"] is True
    for d in (1, 2, 3, 4):
        assert got[d]["n_chars_after"] != got[d]["n_chars_before"]


def test_pii_redact_multiple_hits_one_doc(spark):
    docs = spark.createDataFrame(
        [(9, "a@b.co then c@d.io at 1.2.3.4")], "doc_id bigint, text string"
    )
    (row,) = pii_redact(docs).collect()
    assert row["redacted_text"] == "<EMAIL> then <EMAIL> at <IPV4>"


def test_pii_redact_ipv4_with_wide_octets_not_phone(spark):
    """192.168.123.250 is phone-shaped too; ipv4 must win (pattern order)."""
    docs = spark.createDataFrame(
        [(1, "ip 192.168.123.250 here")], "doc_id bigint, text string"
    )
    (row,) = pii_redact(docs).collect()
    assert row["redacted_text"] == "ip <IPV4> here"
