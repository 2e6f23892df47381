"""Analysis-JSON source (reference S1-S3: /root/reference/src/api/client.rs:29-81,
src/commands/import.rs:106-233).

One JSON document per analyzed binary (format: FIXTURES.md §1,
/root/reference/README.md:228-280). The reference reads one file per Bolt
round-trip; here a whole directory is one distributed ``spark.read.json``
scan — batching (E12) is subsumed by Spark's file partitioning.

Permissive-coalescing quirks reproduced from the reference parser:
- ``sha256`` or ``SHA256`` key (session.rs:266-269)
- ``name`` or ``filename`` (session.rs:271-275)
- ``strings`` items may be objects or bare strings (session.rs:360-366) —
  read as raw-JSON strings and re-parsed with ``from_json`` so both shapes
  survive one schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Arrays are read as raw-JSON element strings (strings may be bare scalars;
# object elements are re-parsed in ingest) — this keeps one permissive
# schema for heterogeneous inputs.
ANALYSIS_SCHEMA = T.StructType(
    [
        T.StructField(
            "binary_info",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("filename", T.StringType()),
                    T.StructField("file_path", T.StringType()),
                    T.StructField("file_size", T.LongType()),
                    T.StructField(
                        "file_type",
                        T.StructType(
                            [
                                T.StructField("type", T.StringType()),
                                T.StructField("architecture", T.StringType()),
                            ]
                        ),
                    ),
                    # map, not struct: JSON field resolution is
                    # case-insensitive, so sha256/SHA256 struct fields
                    # collide; the map keeps whichever spelling appears
                    T.StructField("hashes", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
        T.StructField("functions", T.ArrayType(T.StringType())),
        T.StructField("strings", T.ArrayType(T.StringType())),
        T.StructField("imports", T.ArrayType(T.StringType())),
        T.StructField("exports", T.ArrayType(T.StringType())),
        T.StructField("calls", T.ArrayType(T.StringType())),
    ]
)

#: Above this many input files, the ingest_seq rank map moves from a
#: driver-built broadcast (zero Spark jobs; ~100 bytes per name) to the
#: sharded two-level scan — the driver never holds an unbounded list.
DRIVER_RANK_LIMIT = 100_000

FUNCTION_ITEM = "name STRING, address STRING, size BIGINT"
STRING_ITEM = "value STRING, address STRING"
IMPORT_ITEM = "name STRING, address STRING, library STRING"
EXPORT_ITEM = "name STRING, address STRING"
CALL_ITEM = "from_address STRING, to_address STRING, offset STRING, type STRING"


def read_analysis_json(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Scan analysis JSON (file, directory, glob, or an explicit file
    list) → one row per document, with ``source_file`` and a
    deterministic ``ingest_seq``.

    ``ingest_seq`` reproduces the reference's file-iteration order for
    last-write-wins MERGE semantics (SURVEY.md §7.3 #2): dense rank over
    the lexicographic file name.  Ranked WITHOUT any single-partition
    window (the r7-verdict residual): the file list is driver metadata
    (``df.inputFiles()`` — the FileIndex snapshot, zero Spark jobs), so
    up to ``DRIVER_RANK_LIMIT`` files the rank map is built on the
    driver and broadcast; past that, a sharded two-level scan
    (``functions/ranking.dense_rank_sharded``) ranks distinct names with
    the only serial step being a prefix sum over shard COUNTS.
    """
    df = spark.read.json(path, schema=ANALYSIS_SCHEMA, multiLine=True)
    df = df.withColumn("source_file", F.input_file_name())
    files = set(df.inputFiles())
    if files and len(files) <= DRIVER_RANK_LIMIT:
        # sort by UTF-8 bytes — byte-identical to Spark's UTF8String
        # binary ordering (what orderBy on strings compares, i.e. the
        # dense_rank_sharded path and the streaming window), including
        # for supplementary-plane characters where UTF-16 code-unit
        # order (java.lang.String.compareTo) disagrees
        ranked = sorted(files, key=lambda s: s.encode("utf-8"))
        seq = spark.createDataFrame(
            [(f, i + 1) for i, f in enumerate(ranked)],
            "source_file string, ingest_seq int",
        )
        return df.join(F.broadcast(seq), "source_file")
    from ..functions.ranking import dense_rank_sharded

    seq = dense_rank_sharded(
        df.select("source_file").distinct(), "source_file", "ingest_seq"
    )
    return df.join(F.broadcast(seq), "source_file")


def validate_documents(docs: DataFrame) -> DataFrame:
    """S3: input validation — collect per-document error arrays
    (reference: src/api/client.rs:42-81). Returns (source_file, errors)."""
    checks = [
        (F.col("binary_info").isNull(), "missing binary_info"),
        (
            F.col("binary_info").isNotNull()
            & F.coalesce(
                F.col("binary_info.hashes").getItem("sha256"),
                F.col("binary_info.hashes").getItem("SHA256"),
            ).isNull(),
            "missing binary_info.hashes.sha256",
        ),
        (
            F.col("binary_info").isNotNull()
            & F.coalesce(F.col("binary_info.name"), F.col("binary_info.filename")).isNull(),
            "missing binary_info.name",
        ),
    ]
    errs = F.array_compact(
        F.array(*[F.when(cond, F.lit(msg)) for cond, msg in checks])
    )
    return docs.select("source_file", errs.alias("errors")).filter(F.size("errors") > 0)


#: required binary_info subfields, reference order (client.rs:51)
_REQUIRED_BI_FIELDS = ("name", "file_path", "file_size", "file_type", "hashes")
#: top-level sections that must be JSON arrays when present (client.rs:61-74)
_ARRAY_FIELDS = ("functions", "strings", "imports", "exports")


def validate_raw_json(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """S3, faithful to the reference's ``validate_data``
    (src/api/client.rs:42-81): STRUCTURAL validation of the raw JSON
    text, before any schema-on-read coercion can mask type errors —
    `spark.read.json` with ANALYSIS_SCHEMA silently nulls a non-array
    ``functions``, but the reference reports "functions must be an
    array".  Returns (source_file, error) — one row per violation.

    All checks are JVM-side JSON builtins (json_object_keys /
    get_json_object), no Python UDF: key PRESENCE via json_object_keys
    (distinguishes a missing key from an explicit JSON null, matching
    serde's ``get(field).is_none()``), object-ness via json_object_keys
    returning NULL on non-objects, array-ness via json_array_length
    probing of the extracted value.  Matching the reference's
    ``Value::is_array`` (client.rs:61-74): an explicit JSON null
    (``"functions": null`` → get_json_object yields SQL NULL) and a
    string scalar (``"exports": "oops"``) are both "must be an array"
    errors.  One documented residual: a STRING whose content is itself
    valid JSON-array text (``"exports": "[1,2]"``) extracts unquoted
    and probes as an array — indistinguishable without a raw-text
    parser; accepted as out-of-contract.
    """
    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("source_file", F.input_file_name())
    )
    top_keys = F.json_object_keys("value")
    bi_txt = F.get_json_object("value", "$.binary_info")
    bi_keys = F.json_object_keys(bi_txt)
    def _has(keys, fld: str):
        # NULL-safe key test: a non-object (keys == NULL) has no fields
        return F.coalesce(F.array_contains(keys, F.lit(fld)), F.lit(False))

    checks: list = [
        (~_has(top_keys, "binary_info"), "binary_info is required"),
        (
            _has(top_keys, "binary_info") & bi_keys.isNull(),
            "binary_info must be an object",
        ),
    ]
    for fld in _REQUIRED_BI_FIELDS:
        checks.append(
            (
                bi_keys.isNotNull() & ~_has(bi_keys, fld),
                f"binary_info missing required field: {fld}",
            )
        )
    for fld in _ARRAY_FIELDS:
        v = F.get_json_object("value", f"$.{fld}")
        # Not an array ⇔ explicit null (extraction is SQL NULL) OR the
        # extracted text does not parse as a JSON array (objects,
        # numbers, booleans, and plain strings all probe NULL here).
        checks.append(
            (
                _has(top_keys, fld)
                & (v.isNull() | F.json_array_length(v).isNull()),
                f"{fld} must be an array",
            )
        )
    errs = F.array_compact(
        F.array(*[F.when(cond, F.lit(msg)) for cond, msg in checks])
    )
    return (
        raw.select("source_file", F.explode(errs).alias("error"))
    )
