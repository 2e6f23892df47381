"""Bucketed-table layout: co-located (shuffle-free) fact-fact joins.

At 100 TB the dominant cost of a fact⋈fact join (lineitem ⋈ orders on
orderkey) is the all-to-all shuffle of BOTH sides — terabytes over the
network every time the join runs.  Spark's answer is the bucketed table
layout: write each table once with ``bucketBy(N, key).sortBy(key)`` and
every subsequent equi-join on that key reads matching buckets 1:1 —
``SortMergeJoin`` with **no Exchange and no Sort** on either side.  The
shuffle is paid once at write time and amortized over every downstream
join, the classic warehouse trade for repeatedly-joined fact tables.

The no-Sort half needs two invariants Spark won't give by default:
(1) exactly ONE file per bucket — we ``repartition(buckets, key)``
before the bucketed write (HashPartitioning and bucket-id hashing are
both Murmur3 pmod N, so output partitions map 1:1 onto buckets), and
(2) ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` so the
scan reports the per-file sort order (sound ONLY under invariant 1 —
with several files per bucket the concatenated bucket is NOT sorted,
which is exactly why Spark 3 stopped reporting it by default).

This module materializes bucketed twins of ``orders`` and ``lineitem``
(external parquet tables under a per-session directory — keyed on the
Spark application id, so concurrent sessions on the same sf_dir can
never delete or overwrite each other's registered files) and exposes a
plan guard that *proves* the join is co-located: it walks the physical
plan of the join-only DataFrame and raises if Catalyst inserted any
Exchange **or any Sort** below the join.  The guard runs inside the
registered query, so the gate checks the layout property on every
correctness run, not just in a pytest.

Scale notes (SCALE.md "bucketed layout"):
- bucket count is a layout-time knob: 8 here (local testdata); a 100 TB
  deployment sizes it so one bucket ≈ 100-200 MB per table (e.g. 4096)
  and both sides MUST agree on it for the 1:1 bucket pairing.
- the one-off bucketed write is itself a single shuffle of each table —
  the same cost one un-bucketed join would pay, break-even after the
  second join.
- AQE cannot coalesce bucketed scan partitions (they're not shuffle
  output), so the bucket count also bounds join parallelism — another
  reason the knob is sized to the cluster, not defaulted.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import load_table

#: Layout-time knob; both join sides must agree (1:1 bucket pairing).
DEFAULT_BUCKETS = 8


def _layout_key(spark: SparkSession, sf_dir: str, buckets: int) -> str:
    """Key for the materialized layout: source dir + bucket count + the
    Spark APPLICATION id.  The app id makes the on-disk location
    per-session: two concurrent sessions (bench + pytest) each write and
    read their own directory, so neither can rmtree files the other's
    in-memory catalog still points at."""
    token = f"{sf_dir}|{buckets}|{spark.sparkContext.applicationId}"
    return hashlib.sha256(token.encode()).hexdigest()[:10]


def ensure_bucketed_pair(
    spark: SparkSession, sf_dir: str, buckets: int = DEFAULT_BUCKETS
) -> tuple[str, str]:
    """Materialize bucketed twins of orders/lineitem, bucketed+sorted on
    the orderkey with exactly ONE file per bucket; returns the two table
    names.  Within a session the catalog entry is reused; the location
    is per-session (see :func:`_layout_key`), so a leftover directory
    from a killed run is never trusted or shared — each session writes
    fresh before registering."""
    key = _layout_key(spark, sf_dir, buckets)
    base = os.path.join(tempfile.gettempdir(), "bxg_bucketed", key)
    orders_t = f"bxg_bkt_orders_{key}"
    lineitem_t = f"bxg_bkt_lineitem_{key}"
    # Sound under the one-file-per-bucket invariant enforced below; lets
    # the scan report its sort order so the SMJ needs no Sort node.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    pairs = (
        (orders_t, "orders", "o_orderkey"),
        (lineitem_t, "lineitem", "l_orderkey"),
    )
    for table, src, join_key in pairs:
        if spark.catalog.tableExists(table):
            continue
        path = os.path.join(base, src)
        shutil.rmtree(path, ignore_errors=True)
        df = load_table(spark, sf_dir, src)
        (
            # one output partition per bucket (same Murmur3 pmod N as the
            # bucket-id function) → one file per bucket → per-file sortBy
            # order IS the bucket order
            df.repartition(buckets, F.col(join_key))
            .write.format("parquet")
            .mode("overwrite")
            .option("path", path)
            .bucketBy(buckets, join_key)
            .sortBy(join_key)
            .saveAsTable(table)
        )
    return orders_t, lineitem_t


def assert_colocated_join(joined: DataFrame) -> None:
    """Prove the join is shuffle-free AND sort-free: raise if the
    physical plan of the (join-only) DataFrame contains any Exchange or
    any Sort.  A bucketed-bucketed equi-join on the bucket key must
    satisfy EnsureRequirements from the scan's reported
    HashClusteredDistribution and ordering — an Exchange means the
    layout contract broke (bucket counts diverged, the key drifted,
    bucketed reads disabled); a Sort means the one-file-per-bucket
    invariant broke (a multi-task write snuck in extra files, so Spark
    stopped trusting the per-file order)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed join plan contains an Exchange (layout contract broken):\n" + plan
        )
    if "Sort " in plan:
        raise AssertionError(
            "bucketed join plan contains a Sort (one-file-per-bucket "
            "invariant broken — scan order no longer trusted):\n" + plan
        )


def bucketed_orders_lineitem_join(
    spark: SparkSession, sf_dir: str, buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """The co-located join itself: orders ⋈ lineitem on the bucket key,
    sort-merge forced (``hint("merge")``) so the proof is about the
    layout, not about one side fitting in a broadcast.  The plan guard
    runs on the join-only frame — downstream aggregates may of course
    shuffle their (tiny, post-join) group keys."""
    orders_t, lineitem_t = ensure_bucketed_pair(spark, sf_dir, buckets)
    o = spark.table(orders_t).select("o_orderkey", "o_orderpriority")
    li = spark.table(lineitem_t).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)
    assert_colocated_join(joined)
    return joined


def colocated_priority_revenue(
    spark: SparkSession, sf_dir: str, buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Revenue per order priority over the co-located join — exact
    integer-cents sum (functions/exact.py convention)."""
    joined = bucketed_orders_lineitem_join(spark, sf_dir, buckets)
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round((1 - F.col("l_discount")) * 100).cast("long")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(price_c * disc_c) / F.lit(10000.0)).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
