"""Hand-built micro-graph fixture (FIXTURES.md §3): two binaries covering
every traversal shape, mixed address forms, NUL-trim, shared imports."""

from __future__ import annotations

import json
from pathlib import Path

HASH_A = "a" * 64
HASH_B = "b" * 64

# Binary A addresses in mixed input forms (0x-hex / decimal) to exercise
# normalization (src/utils/uid.rs:8-46). NOTE: digit-only strings parse
# as DECIMAL first (reference branch order) — a "bare hex" form must
# contain a letter, covered in tests/test_scalars.py.
#   main   0x401000  → "0x401000"
#   helper 0x401100  → "4198656"  (decimal)
#   worker 0x401200  → "4198912"  (decimal)
DOC_A = {
    "binary_info": {
        "name": "mal_a.exe",
        "file_path": "/samples/mal_a.exe",
        "file_size": 4096,
        "file_type": {"type": "PE32", "architecture": "x86"},
        "hashes": {"sha256": HASH_A},
    },
    "functions": [
        {"name": "main", "address": "0x401000", "size": 256},
        {"name": "helper", "address": "4198656", "size": 128},
        {"name": "worker", "address": "4198912"},
    ],
    "strings": [
        {"value": "Pay Bitcoin", "address": "0x403000"},
        {"value": "hello\x00"},
        "barestr",
    ],
    "imports": [
        {"name": "CreateFileA", "address": "0x405000", "library": "KERNEL32"},
    ],
    "exports": [
        {"name": "exported_fn", "address": "0x401300"},
        # address already mapped: the MAP entry stays (only-if-absent,
        # session.rs:217-224) but the NODE is re-MERGEd with Export
        # type/size (import_function always runs, session.rs:226)
        {"name": "main", "address": "0x401000"},
        {"name": "bogus_export", "address": "xyz"},  # unparseable → skipped
    ],
    "calls": [
        {"from_address": "0x401000", "to_address": "4198656", "offset": "0x401010", "type": "direct"},
        {"from_address": "0x401000", "to_address": "0x405000", "offset": "0x401020", "type": "INDIRECT"},
        {"from_address": "0x401100", "to_address": "4198912", "offset": "0x401110"},
        {"from_address": "4198912", "to_address": "0x401100", "offset": "0x401210", "type": "bogus"},
        {"from_address": "0x401200", "to_address": "0x401200", "offset": "0x401220", "type": "tail"},
        {"from_address": "0x999999", "to_address": "0x401000", "offset": "0x1", "type": "direct"},  # unresolved from
    ],
}

DOC_B = {
    "binary_info": {
        "name": "mal_b.elf",
        "file_path": "/samples/mal_b.elf",
        "file_size": 2048,
        "file_type": {"type": "ELF64", "architecture": "x86_64"},
        "hashes": {"SHA256": HASH_B},  # upper-key coalescing branch
    },
    "functions": [{"name": "main", "address": "0x401000", "size": 64}],
    "strings": [{"value": "Pay Bitcoin", "address": "0x2000"}],
    "imports": [{"name": "CreateFileA", "address": "0x404000", "library": "kernel32"}],
    "exports": [],
    "calls": [],
}


def write_fixture(tmpdir: str | Path) -> str:
    d = Path(tmpdir) / "analysis_json"
    d.mkdir(parents=True, exist_ok=True)
    (d / "a.json").write_text(json.dumps(DOC_A))
    (d / "b.json").write_text(json.dumps(DOC_B))
    return str(d)


# Seeded malformed documents exercising EVERY validation branch of the
# reference's validate_data (src/api/client.rs:42-81): missing/non-object
# binary_info, each missing required subfield, and each non-array section.
# The two valid docs (DOC_A/DOC_B) ride along to pin the no-error case.
_BI_OK = {
    "name": "ok.exe",
    "file_path": "/samples/ok.exe",
    "file_size": 1,
    "file_type": {"type": "PE32", "architecture": "x86"},
    "hashes": {"sha256": "c" * 64},
}

MALFORMED_DOCS: dict[str, dict | list] = {
    # binary_info absent entirely (two docs → the aggregate sees n=2)
    "v1_no_binary_info.json": {"functions": []},
    "v2_no_binary_info.json": {"strings": []},
    # binary_info present but not an object
    "v3_binary_info_string.json": {"binary_info": "not an object"},
    # object missing four of the five required fields
    "v4_missing_fields.json": {"binary_info": {"name": "x.exe"}},
    # required-field check independent of the array checks
    "v5_missing_name_bad_exports.json": {
        "binary_info": {k: v for k, v in _BI_OK.items() if k != "name"},
        "exports": {"name": "oops"},
    },
    # every non-binary_info section with the wrong JSON type
    "v6_bad_arrays.json": {
        "binary_info": _BI_OK,
        "functions": {"name": "not-a-list"},
        "strings": "oops",
        "imports": 7,
    },
}


def write_validation_fixture(tmpdir: str | Path) -> str:
    """Valid docs + MALFORMED_DOCS — the S3 gate query's input batch."""
    d = Path(write_fixture(tmpdir))
    for name, doc in MALFORMED_DOCS.items():
        (d / name).write_text(json.dumps(doc))
    return str(d)


# Edge cases the leading-character array test used to miss (r5 ADVICE,
# reference client.rs:61-74 Value::is_array): explicit JSON null and
# string scalars must BOTH report "<fld> must be an array".  The one
# documented residual — a string whose CONTENT is valid JSON-array text
# — extracts unquoted and probes as an array; v4 pins that accepted
# divergence so any future change to it is a loud diff.
MALFORMED_NULL_DOCS: dict[str, dict] = {
    # explicit nulls: serde sees Value::Null, not a missing key
    "n1_null_sections.json": {"binary_info": _BI_OK, "functions": None, "strings": None},
    # string scalar (content does NOT look like an array)
    "n2_string_exports.json": {"binary_info": _BI_OK, "exports": "oops"},
    # boolean scalar
    "n3_bool_imports.json": {"binary_info": _BI_OK, "imports": True},
    # RESIDUAL: string whose content parses as a JSON array — passes
    # (out-of-contract; see validate_raw_json docstring)
    "n4_arraylike_string.json": {"binary_info": _BI_OK, "exports": "[1,2]"},
}


def write_validation_nulls_fixture(tmpdir: str | Path) -> str:
    """MALFORMED_NULL_DOCS plus one fully-valid doc (DOC_B) — input for
    the ingest_validation_null_arrays gate query."""
    d = Path(tmpdir) / "analysis_json_nulls"
    d.mkdir(parents=True, exist_ok=True)
    (d / "ok.json").write_text(json.dumps(DOC_B))
    for name, doc in MALFORMED_NULL_DOCS.items():
        (d / name).write_text(json.dumps(doc))
    return str(d)


UID_MAIN_A = f"{HASH_A}:0x401000"
UID_HELPER_A = f"{HASH_A}:0x401100"
UID_WORKER_A = f"{HASH_A}:0x401200"
UID_EXPORTED_A = f"{HASH_A}:0x401300"
UID_MAIN_B = f"{HASH_B}:0x401000"
UID_CREATEFILE = "imp:kernel32:CreateFileA"
