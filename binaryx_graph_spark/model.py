"""Schemas for the graph warehouse + loaders for the driver testdata.

Graph model (reference: SURVEY.md §1; node structs
``/root/reference/src/models/nodes.rs:27-142``, edge merges
``/root/reference/src/neo4j/importer.rs:86-320``):

node tables
    binaries(hash*, filename, file_path, file_size, format, arch)
    functions(uid*, name, type, address, size)
    strings(uid*, value)
    libraries(name*)

edge tables
    contains(binary_hash, function_uid)
    imports(binary_hash, function_uid, address)
    imports_library(binary_hash, library_name)
    belongs_to(function_uid, library_name)
    calls(src_uid, dst_uid, offset, call_type)
    contains_string(binary_hash, string_uid, address)

`*` = unique key (the reference's Neo4j unique constraints,
``src/neo4j/schema.rs:20-29``, become dedup invariants here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------- node tables

BINARIES_SCHEMA = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("filename", T.StringType(), True),
        T.StructField("file_path", T.StringType(), True),
        T.StructField("file_size", T.LongType(), True),
        T.StructField("format", T.StringType(), True),  # PE | Elf | MachO
        T.StructField("arch", T.StringType(), True),
    ]
)

FUNCTIONS_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),  # Internal|Import|Export|Thunk
        T.StructField("address", T.StringType(), True),  # '' sentinel when absent
        T.StructField("size", T.LongType(), True),  # -1 sentinel when absent
    ]
)

STRINGS_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
    ]
)

LIBRARIES_SCHEMA = T.StructType([T.StructField("name", T.StringType(), False)])

# ---------------------------------------------------------------- edge tables

CONTAINS_SCHEMA = T.StructType(
    [
        T.StructField("binary_hash", T.StringType(), False),
        T.StructField("function_uid", T.StringType(), False),
    ]
)

IMPORTS_SCHEMA = T.StructType(
    [
        T.StructField("binary_hash", T.StringType(), False),
        T.StructField("function_uid", T.StringType(), False),
        T.StructField("address", T.StringType(), True),
    ]
)

IMPORTS_LIBRARY_SCHEMA = T.StructType(
    [
        T.StructField("binary_hash", T.StringType(), False),
        T.StructField("library_name", T.StringType(), False),
    ]
)

BELONGS_TO_SCHEMA = T.StructType(
    [
        T.StructField("function_uid", T.StringType(), False),
        T.StructField("library_name", T.StringType(), False),
    ]
)

CALLS_SCHEMA = T.StructType(
    [
        T.StructField("src_uid", T.StringType(), False),
        T.StructField("dst_uid", T.StringType(), False),
        T.StructField("offset", T.StringType(), True),  # raw input form, string-sorted
        T.StructField("call_type", T.StringType(), True),  # direct|indirect|virtual|tail
    ]
)

CONTAINS_STRING_SCHEMA = T.StructType(
    [
        T.StructField("binary_hash", T.StringType(), False),
        T.StructField("string_uid", T.StringType(), False),
        T.StructField("address", T.StringType(), True),
    ]
)

NODE_TABLES = {
    "binaries": (BINARIES_SCHEMA, ["hash"]),
    "functions": (FUNCTIONS_SCHEMA, ["uid"]),
    "strings": (STRINGS_SCHEMA, ["uid"]),
    "libraries": (LIBRARIES_SCHEMA, ["name"]),
}

EDGE_TABLES = {
    "contains": (CONTAINS_SCHEMA, ["binary_hash", "function_uid"]),
    "imports": (IMPORTS_SCHEMA, ["binary_hash", "function_uid"]),
    "imports_library": (IMPORTS_LIBRARY_SCHEMA, ["binary_hash", "library_name"]),
    "belongs_to": (BELONGS_TO_SCHEMA, ["function_uid", "library_name"]),
    "calls": (CALLS_SCHEMA, ["src_uid", "dst_uid"]),
    "contains_string": (CONTAINS_STRING_SCHEMA, ["binary_hash", "string_uid", "address"]),
}

# ------------------------------------------------------- driver testdata I/O

#: testdata columns physically stored as parquet TIMESTAMP(NANOS); with
#: ``spark.sql.legacy.parquet.nanosAsLong`` they surface as BIGINT nanos
#: and are converted back to proper (micro-precision) timestamps here.
NANO_TS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, restoring nano-timestamp columns.

    The conversion is exact: the generator writes microsecond-aligned
    values, so ``nanos // 1000 → timestamp_micros`` loses nothing.
    """
    try:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    except Exception:
        # Session without nanosAsLong (e.g. driver-provided): set it at
        # runtime (it is a SQL conf) and retry once.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in NANO_TS_COLUMNS.get(name, []):
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros((F.col(col) / F.lit(1000)).cast("long")))
    # The generator has shipped TIMESTAMP(NANOS) (→ BIGINT above) and
    # TIMESTAMP(MICROS) with isAdjustedToUTC=false (→ TIMESTAMP_NTZ)
    # across rounds. Normalize NTZ → session-tz TIMESTAMP: the session
    # is pinned to UTC, so the cast is value-preserving and every query
    # (incl. unix_micros, which rejects NTZ) sees one timestamp type.
    for f in df.schema.fields:
        if isinstance(f.dataType, T.TimestampNTZType):
            df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
