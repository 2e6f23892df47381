"""Scaled analysis-corpus projection: synthesize BinaryX-style analysis
documents FROM the relational testdata so the full ingest ETL (E1-E12)
can be oracle-checked at every scale factor, not just on the 2-binary
fixture.

Mapping (deterministic, SQL-reproducible):
  customer  → one binary  (hash = sha256(c_name))
  order     → one function (address = 0x{o_orderkey:x},
                            name = fn_{o_orderkey},
                            size = o_totalprice in cents)
  consecutive orders of a customer (by date, key) → one call edge

The documents are built as DataFrame rows in the analysis-JSON SHAPE
(arrays of raw-JSON element strings, exactly what the JSON source
produces) — so `build_graph_tables` runs its real `from_json` parsing,
UID generation, address-map resolution, and MERGE dedup, distributed,
on tens of thousands of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..model import load_table


def scaled_analysis_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    o = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        "o_totalprice",
        "o_orderdate",
        F.concat(F.lit("0x"), F.lower(F.hex("o_orderkey"))).alias("addr"),
    )

    fn_json = F.to_json(
        F.struct(
            F.concat(F.lit("fn_"), F.col("o_orderkey")).alias("name"),
            F.col("addr").alias("address"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("size"),
        )
    )

    w = Window.partitionBy("c_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("addr").over(w)
    call_json = F.when(
        nxt.isNotNull(),
        F.to_json(
            F.struct(
                F.col("addr").alias("from_address"),
                nxt.alias("to_address"),
                F.concat(F.lit("0x"), F.lower(F.hex(F.row_number().over(w)))).alias("offset"),
                F.lit("direct").alias("type"),
            )
        ),
    )

    per_cust = (
        o.withColumn("_fn", fn_json)
        .withColumn("_call", call_json)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.collect_list("_fn").alias("functions"),
            F.collect_list("_call").alias("calls"),  # nulls dropped by collect_list
        )
    )

    empty = F.array().cast("array<string>")
    return per_cust.select(
        F.struct(
            F.col("c_name").alias("name"),
            F.lit(None).cast("string").alias("filename"),
            F.lit("/corpus").alias("file_path"),
            F.lit(0).cast("long").alias("file_size"),
            F.struct(F.lit("PE32").alias("type"), F.lit("x86").alias("architecture")).alias("file_type"),
            F.create_map(F.lit("sha256"), F.sha2(F.col("c_name"), 256)).alias("hashes"),
        ).alias("binary_info"),
        "functions",
        empty.alias("strings"),
        empty.alias("imports"),
        empty.alias("exports"),
        "calls",
        F.lit("synthetic").alias("source_file"),
        F.lit(1).alias("ingest_seq"),
    )
