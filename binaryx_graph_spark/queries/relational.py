"""Relational operator surface (SURVEY.md §2.3, §2.5, §2.8-2.10) expressed
on the driver testdata star schema, each with a DuckDB oracle.

Reference parity notes (cites into /root/reference):
- substring search F1  → src/neo4j/importer.rs:322-376 (CONTAINS predicate,
  hard LIMIT 100); here over ``part.p_name``.
- lookup-limit-1 F2    → src/neo4j/importer.rs:431-469; over ``customer``.
- scope semi-join J1   → src/neo4j/importer.rs:329-331; EXISTS filter J2 →
  importer.rs:482.
- unresolved anti-join E8 → src/api/session.rs:494-510 (skip+count).
- counts A1/A2         → src/neo4j/importer.rs:27-80, connection.rs:55-81.
- distinct-count A3    → src/neo4j/importer.rs:389-397.
- ordered top-k K1/K5  → importer.rs:390-391; query.rs:454-458.
- union/distinct U1-U3 → importer.rs:561, 569.
- row-number counters O1/O2 → call_path_analyzer.rs:230-247.

The reference's `LIMIT` carries no ORDER BY (Neo4j picks an arbitrary
subset); we add a deterministic tie-broken ORDER BY — documented
divergence so results are reproducible and oracle-checkable.

All money math uses exact integer cents (see functions/exact.py): the
product ``price × (1-disc)`` is computed as ``cents(price) ×
cents(1-disc)`` (an exact int64) on BOTH sides, so sums are
order-independent and bit-identical between Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import cents, dollars, sql_sum_cents, sum_cents_exact, wide_cents_enabled
from ..model import load_table
from ..registry import register

# DuckDB twins of the cents-product expressions.
_SQL_PRICE_C = "CAST(round(l_extendedprice*100) AS BIGINT)"
_SQL_DISC_C = "CAST(round((1-l_discount)*100) AS BIGINT)"
_SQL_TAX_C = "CAST(round((1+l_tax)*100) AS BIGINT)"
_SQL_REVENUE = f"CAST(sum({_SQL_PRICE_C} * {_SQL_DISC_C}) AS BIGINT) / 10000.0"


def _disc_price_c():
    return cents("l_extendedprice") * F.round((1 - F.col("l_discount")) * 100).cast("long")


# --------------------------------------------------------------------------
# Headline aggregation (TPC-H Q1 shape): scan → filter → groupBy → 8 aggs →
# sort.  Exercises partial+final agg, shipdate filter pushdown, and
# whole-stage codegen.
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty,
      {sql_sum_cents('l_extendedprice')} / 100.0 AS sum_base_price,
      {_SQL_REVENUE} AS sum_disc_price,
      CAST(sum({_SQL_PRICE_C} * {_SQL_DISC_C} * {_SQL_TAX_C}) AS BIGINT) / 1000000.0 AS sum_charge,
      CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avg_qty,
      {sql_sum_cents('l_extendedprice')} / (count(*) * 100.0) AS avg_price,
      {sql_sum_cents('l_discount')} / (count(*) * 100.0) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "headline"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary over lineitem (A-class aggregations, K-class sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    price_c = cents("l_extendedprice")
    disc_c = F.round((1 - F.col("l_discount")) * 100).cast("long")
    tax_c = F.round((1 + F.col("l_tax")) * 100).cast("long")
    n = F.count(F.lit(1))

    # overflow-proof cents sums: spark.graft.cents.wide=true switches the
    # group sums to decimal(38,0) for 1e9-row-per-group scale (identical
    # doubles after the /100 divisions; see functions/exact.py)
    wide = wide_cents_enabled(spark)

    def s(e):
        return sum_cents_exact(e, wide=wide)

    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            dollars(s(price_c)).alias("sum_base_price"),
            (s(price_c * disc_c) / F.lit(10000.0)).alias("sum_disc_price"),
            (s(price_c * disc_c * tax_c) / F.lit(1000000.0)).alias("sum_charge"),
            (F.sum(qty) / n.cast("double")).alias("avg_qty"),
            (s(price_c) / (n * F.lit(100.0))).alias("avg_price"),
            (s(cents("l_discount")) / (n * F.lit(100.0))).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      {_SQL_REVENUE} AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "headline"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + deterministic top-k.

    ``customer`` is dimension-sized → explicit broadcast (no shuffle for
    that side); lineitem↔orders co-shuffle on the order key once.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg((F.sum(_disc_price_c()) / F.lit(10000.0)).alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle=f"""
    SELECT n_name, {_SQL_REVENUE} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "headline"),
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join (local-supplier volume, TPC-H Q5 shape).

    All dimensions (region, nation, customer, supplier) broadcast; the
    only shuffle is lineitem↔orders on the order key.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg((F.sum(_disc_price_c()) / F.lit(10000.0)).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# F-class: substring search / lookup (reference flagship filters)
# --------------------------------------------------------------------------


@register(
    "substring_search",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type
    FROM part
    WHERE p_name LIKE '%red%' OR p_type LIKE '%PROMO%'
    ORDER BY p_partkey
    LIMIT 100
    """,
    tags=("filter",),
)
def substring_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: `name CONTAINS p OR uid CONTAINS p`, capped at 100 rows.

    Reference: src/neo4j/importer.rs:322-376 (hard LIMIT 100 in Cypher);
    deterministic ORDER BY added (divergence documented in module doc).
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_name").contains("red") | F.col("p_type").contains("PROMO"))
        .select("p_partkey", "p_name", "p_brand", "p_type")
        .orderBy("p_partkey")
        .limit(100)
    )


@register(
    "lookup_first_match",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_name LIKE '%#00000042%' OR c_custkey = 42
    ORDER BY c_custkey
    LIMIT 1
    """,
    tags=("filter",),
)
def lookup_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: binary lookup by `hash = x OR filename CONTAINS x`, LIMIT 1.

    Reference: src/neo4j/importer.rs:431-469.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.filter(F.col("c_name").contains("#00000042") | (F.col("c_custkey") == 42))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
        .limit(1)
    )


# --------------------------------------------------------------------------
# J-class: semi/anti joins (binary-scope filters, unresolved-edge skip)
# --------------------------------------------------------------------------


@register(
    "scope_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE c_mktsegment = 'MACHINERY'
      AND EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    ORDER BY c_custkey
    """,
    tags=("join",),
)
def scope_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2: membership (EXISTS) semi-join — the reference's binary-scope
    filter `(b)-[:CONTAINS|IMPORTS]->(f)` (src/neo4j/importer.rs:329-331)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "unresolved_anti_join",
    oracle="""
    SELECT o_orderstatus, count(*) AS n_unmatched
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("join",),
)
def unresolved_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8: unresolved-reference skip + count (src/api/session.rs:494-510) —
    rows whose key finds no match are excluded and tallied."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_unmatched"))
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# A-class: counts & statistics
# --------------------------------------------------------------------------


@register(
    "table_stats",
    oracle="""
    SELECT 'customer' AS table_name, count(*) AS n FROM customer
    UNION ALL SELECT 'events', count(*) FROM events
    UNION ALL SELECT 'lineitem', count(*) FROM lineitem
    UNION ALL SELECT 'nation', count(*) FROM nation
    UNION ALL SELECT 'orders', count(*) FROM orders
    UNION ALL SELECT 'part', count(*) FROM part
    UNION ALL SELECT 'region', count(*) FROM region
    UNION ALL SELECT 'supplier', count(*) FROM supplier
    ORDER BY table_name
    """,
    tags=("agg",),
)
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: per-label node counts + global stats
    (src/neo4j/importer.rs:27-80, src/neo4j/connection.rs:55-81)."""
    frames = []
    for name in ["customer", "events", "lineitem", "nation", "orders", "part", "region", "supplier"]:
        df = load_table(spark, sf_dir, name)
        frames.append(df.agg(F.count(F.lit(1)).alias("n")).select(F.lit(name).alias("table_name"), "n"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("table_name")


@register(
    "distinct_users_per_type",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("agg",),
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: `count(DISTINCT b) AS sample_count` per group
    (src/neo4j/importer.rs:389-397)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count(F.lit(1)).alias("n_events"))
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# K-class: sorts / limits / top-k
# --------------------------------------------------------------------------


@register(
    "topk_events_by_value",
    oracle="""
    SELECT event_id, event_type, user_id, value
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 20
    """,
    tags=("sort",),
)
def topk_events_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1: ORDER BY score DESC LIMIT n (src/neo4j/importer.rs:390-391)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_id", "event_type", "user_id", "value")
        .orderBy(F.desc("value"), "event_id")
        .limit(20)
    )


@register(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    )
    WHERE rk <= 3
    ORDER BY o_custkey, rk
    """,
    tags=("window",),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5-analog: top-k per group via row_number window (the reference's
    client-side top-10-longest-paths, src/commands/query.rs:454-458)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    )


@register(
    "event_sequences",
    oracle="""
    SELECT user_id, event_id, event_type,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
    FROM events
    WHERE user_id % 100 = 7
    ORDER BY user_id, seq
    """,
    tags=("window",),
)
def event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: execution-order sequences — ordered 1-hop edges with a
    monotonically increasing order counter
    (src/neo4j/call_path_analyzer.rs:196-251, counter at
    src/commands/query.rs:230-247)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 7)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", "event_type", F.row_number().over(w).alias("seq"))
        .orderBy("user_id", "seq")
    )


# --------------------------------------------------------------------------
# U-class: set operations
# --------------------------------------------------------------------------


@register(
    "union_distinct_arms",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'purchase'
    UNION
    SELECT user_id FROM events WHERE event_type = 'signup'
    ORDER BY user_id
    """,
    tags=("setop",),
)
def union_distinct_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/U2: UNION of query arms + DISTINCT (src/neo4j/importer.rs:561-569)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "signup").select("user_id")
    return a.unionByName(b).distinct().orderBy("user_id")


@register(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(sum({_SQL_PRICE_C} * CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) / 10000.0
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
    tags=("agg", "headline"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + selective filter + single agg — the
    pushdown/codegen stress query (all predicates reach the parquet
    scan; zero shuffles beyond the final partial-agg exchange)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(cents("l_extendedprice") * disc_c) / F.lit(10000.0)).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_SQL_REVENUE} AS revenue, n_name
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customers who returned items, top-20 by lost
    revenue — 4-way join with two broadcast dims."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg((F.sum(_disc_price_c()) / F.lit(10000.0)).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 250
    )
    GROUP BY c_custkey, o_orderkey
    ORDER BY total_qty DESC, o_orderkey
    """,
    tags=("join", "agg"),
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-quantity orders via an IN-subquery
    (semi-join against a HAVING aggregate)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "o_orderkey")
        .agg(F.sum(qty).alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
    )


@register(
    "pivot_event_counts",
    oracle="""
    SELECT user_id % 10 AS user_bucket,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    tags=("agg", "pivot"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event-type columns per user bucket (`.pivot()` compiles to
    conditional aggregation — the oracle IS that conditional form)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("user_bucket")
    )


@register(
    "setops_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'purchase'
      INTERSECT
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    UNION ALL
    SELECT 'except', user_id FROM (
      SELECT user_id FROM events WHERE event_type = 'signup'
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    ORDER BY op, user_id
    """,
    tags=("setop",),
)
def setops_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (beyond the reference's UNION-only surface)."""
    ev = load_table(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = ev.filter(F.col("event_type") == "error").select("user_id")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id")
    inter = buyers.intersect(erroring).select(F.lit("intersect").alias("op"), "user_id")
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep users
    # whose signup multiplicity exceeds their purchase multiplicity
    exc = signups.subtract(buyers).select(F.lit("except").alias("op"), "user_id")
    return inter.unionByName(exc).orderBy("op", "user_id")


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
      SELECT l_partkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq,
             count(*) AS nq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum({_SQL_PRICE_C}) AS BIGINT) / 100.0 AS small_qty_revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part_avg a ON l.l_partkey = a.l_partkey
    WHERE CAST(round(l.l_quantity) AS BIGINT) * a.nq * 5 < a.sq
    """,
    tags=("join", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average via a self-grouped
    join; the avg comparison is done in exact integer cross-multiplied
    form (qty < 0.2·avg ⟺ qty·n·5 < sum) so no float threshold wobble."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    part_avg = li.groupBy("l_partkey").agg(
        F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("nq")
    )
    return (
        li.join(part_avg, "l_partkey")
        .filter(qty * F.col("nq") * 5 < F.col("sq"))
        .agg(
            (F.sum(cents("l_extendedprice")) / F.lit(100.0)).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "median_price_per_segment",
    oracle="""
    SELECT c_mktsegment,
           quantile_cont(o_totalprice, 0.5) AS median_order_price,
           count(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg",),
)
def median_price_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median (continuous interpolation) — Spark
    `percentile` vs DuckDB `quantile_cont`, identical linear-interp
    arithmetic over the same sorted doubles."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.percentile("o_totalprice", 0.5).alias("median_order_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q4_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "agg"),
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a LEFT SEMI join (orders
    with any lineitem shipped >60 days after the order date), then
    count by priority. Catalyst plans the semi join shuffle-side;
    nothing is re-scanned per order."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    cond = (F.col("o_orderkey") == F.col("l_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(late, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_revenue_share",
    oracle=f"""
    SELECT 100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN ({_SQL_PRICE_C} * {_SQL_DISC_C})
                               ELSE CAST(0 AS BIGINT) END) AS BIGINT)
                 / CAST(sum(({_SQL_PRICE_C} * {_SQL_DISC_C})) AS BIGINT) AS promo_share_pct,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue
    share) over a broadcast dimension join — exact integer cents in both
    branches, ONE double division at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc_c = _disc_price_c()
    promo_c = F.when(F.col("p_type").like("PROMO%"), disc_c).otherwise(F.lit(0).cast("long"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo_c) / F.sum(disc_c)).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q16_supplier_distinct_parts",
    oracle="""
    SELECT p_brand, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
    tags=("join", "agg"),
)
def q16_supplier_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: DISTINCT-count aggregation with dimension
    exclusion filters — the filters reach the part scan (pushed), the
    distinct count is a two-phase (partial/final) aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH li AS (SELECT l_orderkey, l_suppkey, l_shipdate FROM lineitem),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM li l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late t JOIN supplier s ON t.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM li x
        WHERE x.l_orderkey = t.l_orderkey AND x.l_suppkey <> t.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late y
        WHERE y.l_orderkey = t.l_orderkey AND y.l_suppkey <> t.l_suppkey
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    tags=("join", "agg"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS decorrelated to a
    LEFT SEMI then a LEFT ANTI join, both with (equi ∧ non-equi)
    conditions — suppliers who were the SOLE late shipper (>30 days
    after the order date) on a multi-supplier order, counted and
    top-20'd. The heaviest nested-subquery shape in the TPC-H family."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")

    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    others = li.select(
        F.col("l_orderkey").alias("_ok"), F.col("l_suppkey").alias("_sk")
    ).distinct()
    sole = late.join(
        others,
        (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("_lok"), F.col("l_suppkey").alias("_lsk")
    )
    sole = sole.join(
        other_late,
        (F.col("l_orderkey") == F.col("_lok")) & (F.col("l_suppkey") != F.col("_lsk")),
        "left_anti",
    )
    return (
        sole.join(F.broadcast(supp), sole.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )
