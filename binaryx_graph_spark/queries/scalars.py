"""Oracle-checked exercises of the scalar kernel (SURVEY.md §2.11) over
testdata: address normalization C2-C4 and sha256 UID generation C1/C6.

Inputs are synthesized deterministically from table keys in three mixed
forms (0X-prefixed padded upper hex / decimal / bare lower hex) to walk
every branch of the reference's parser (src/utils/uid.rs:8-46).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.addr import normalize_address
from ..functions.uid import string_uid
from ..model import load_table
from ..registry import register


@register(
    "address_normalization",
    oracle="""
    SELECT
      event_id,
      CASE event_id % 3
        WHEN 0 THEN '0X' || lpad(upper(to_hex(event_id)), 8, '0')
        WHEN 1 THEN CAST(event_id AS VARCHAR)
        ELSE lower(to_hex(event_id * 16 + 15))
      END AS raw_addr,
      CASE event_id % 3
        WHEN 2 THEN '0x' || lower(to_hex(event_id * 16 + 15))
        ELSE '0x' || lower(to_hex(event_id))
      END AS norm_addr
    FROM events
    WHERE event_id % 7 = 0
    ORDER BY event_id
    """,
    tags=("scalar",),
)
def address_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2-C4: tolerant address parse + canonical reformat
    (src/utils/uid.rs:8-46), run as a vectorized Column expression.

    The oracle constructs the expected canonical form directly; the Spark
    side actually parses the mixed-form string — so a parser bug breaks
    the hash match.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    raw = (
        F.when(
            F.col("event_id") % 3 == 0,
            F.concat(F.lit("0X"), F.lpad(F.upper(F.hex(F.col("event_id"))), 8, "0")),
        )
        .when(F.col("event_id") % 3 == 1, F.col("event_id").cast("string"))
        # ×16+15 appends hex digit 'f', guaranteeing a letter so the
        # decimal-first parse branch can't claim digit-only hex strings
        .otherwise(F.lower(F.hex(F.col("event_id") * 16 + 15)))
    )
    return (
        ev.select("event_id", raw.alias("raw_addr"))
        .withColumn("norm_addr", normalize_address("raw_addr"))
        .orderBy("event_id")
    )


@register(
    "string_uids",
    oracle="""
    SELECT c_custkey, 'str:' || sha256(c_name) AS uid
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar",),
)
def string_uids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C6: global string UID = 'str:' + sha256 (src/models/nodes.rs:93-103,
    src/utils/uid.rs:3-6) via built-in F.sha2 — no UDF."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_custkey", string_uid("c_name").alias("uid")).orderBy("c_custkey")
