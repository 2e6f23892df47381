"""Property-based ingest tests (hypothesis): random analysis documents →
graph invariants that must hold for ANY input (referential integrity,
key uniqueness, idempotence, address canonicalization)."""

from __future__ import annotations

import json
import os
import sys

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from binaryx_graph_spark.operators.ingest import build_graph_tables
from binaryx_graph_spark.sources.json_source import read_analysis_json

_name = st.text(alphabet="abcdefgh_", min_size=1, max_size=8)
_addr_int = st.integers(min_value=1, max_value=0xFFFFFF)


def _addr_form(n: int, form: int) -> str:
    return [f"0x{n:x}", str(n), f"0X{n:08X}"][form % 3]


_function = st.builds(
    lambda name, addr, form, size: {
        "name": name,
        "address": _addr_form(addr, form),
        **({"size": size} if size is not None else {}),
    },
    _name,
    _addr_int,
    st.integers(0, 2),
    st.one_of(st.none(), st.integers(0, 1 << 20)),
)

_doc = st.builds(
    lambda h, fns, n_calls, call_seed: {
        "binary_info": {
            "name": f"bin_{h[:6]}.exe",
            "file_path": "/x",
            "file_size": 1,
            "file_type": {"type": "PE32", "architecture": "x86"},
            "hashes": {"sha256": h},
        },
        "functions": fns,
        "strings": [],
        "imports": [],
        "exports": [],
        # calls reference real function addresses (mod-indexed) plus one
        # guaranteed-dangling address to exercise skip-counting
        "calls": [
            {
                "from_address": fns[(call_seed + i) % len(fns)]["address"],
                "to_address": fns[(call_seed + 2 * i + 1) % len(fns)]["address"],
                "offset": f"0x{i:x}",
            }
            for i in range(min(n_calls, len(fns)))
        ]
        + [{"from_address": "0xdeadbeef99", "to_address": fns[0]["address"], "offset": "0x0"}],
    },
    st.text(alphabet="0123456789abcdef", min_size=64, max_size=64),
    st.lists(_function, min_size=1, max_size=5),
    st.integers(0, 4),
    st.integers(0, 100),
)


@settings(
    max_examples=3,  # each example pays full Spark job latency
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(docs=st.lists(_doc, min_size=1, max_size=3, unique_by=lambda d: d["binary_info"]["hashes"]["sha256"]))
def test_ingest_invariants(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp("prop")
    for i, doc in enumerate(docs):
        (d / f"doc_{i}.json").write_text(json.dumps(doc))

    tables = build_graph_tables(read_analysis_json(spark, str(d)))
    functions = tables["functions"].cache()
    calls = tables["calls"].cache()

    # key uniqueness (the reference's unique constraints)
    assert functions.count() == functions.select("uid").distinct().count()
    assert tables["binaries"].count() == len(docs)

    # referential integrity: every call endpoint is a known function
    fn_uids = functions.select("uid")
    dangling = (
        calls.select(F.col("src_uid").alias("uid"))
        .unionByName(calls.select(F.col("dst_uid").alias("uid")))
        .join(fn_uids, "uid", "left_anti")
    )
    assert dangling.count() == 0

    # the planted dangling source was skipped and counted
    stats = tables["import_stats"].agg(F.sum("calls_skipped").alias("s")).collect()[0]["s"]
    assert stats >= len(docs)

    # address canonicalization: stored addresses are canonical 0x{:x}
    bad = functions.filter(
        (F.col("address") != "") & ~F.col("address").rlike("^0x[0-9a-f]+$")
    )
    assert bad.count() == 0


@given(v=st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=300, deadline=None)
def test_u64_address_roundtrip_property(v):
    """Full-u64 property: every representation of v parses back to v, and
    normalization is idempotent (pure-Python twin; the Column kernel is
    pinned equal in tests/test_scalars.py)."""
    from binaryx_graph_spark.functions.addr import normalize_address_py, parse_address_py

    canon = f"0x{v:x}"
    assert parse_address_py(canon) == v
    assert parse_address_py(f"0X{v:X}") == v
    assert parse_address_py(str(v)) == v
    assert normalize_address_py(canon) == canon
    assert normalize_address_py(normalize_address_py(str(v))) == canon


@given(v=st.integers(min_value=2**64, max_value=2**80))
@settings(max_examples=100, deadline=None)
def test_beyond_u64_is_null_property(v):
    """Anything above u64::MAX is unparseable in every form, exactly like
    Rust's u64::from_str_radix."""
    from binaryx_graph_spark.functions.addr import parse_address_py

    assert parse_address_py(f"0x{v:x}") is None
    # the decimal string falls through to a bare-hex attempt, but any
    # value > 2^64 has >= 20 decimal digits > 16 hex digits -> still None
    assert parse_address_py(str(v)) is None
