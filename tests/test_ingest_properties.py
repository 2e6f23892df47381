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
