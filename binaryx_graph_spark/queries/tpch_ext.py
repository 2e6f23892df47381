"""The remaining TPC-H query shapes (Q2, Q7-Q9, Q11-Q13, Q15, Q19, Q20,
Q22), adapted to the driver testdata's schema subset, completing the full
22-query relational suite alongside queries/relational.py.

The testdata star schema has no ``partsupp`` table and omits several
columns (l_shipmode, l_commitdate, l_receiptdate, c_phone, p_container,
ps_supplycost).  Each query below keeps the REFERENCE SHAPE of its TPC-H
counterpart — the join graph, the subquery/decorrelation pattern, the
aggregation structure — while substituting schema-available stand-ins
(documented per query).  The point is plan coverage: min-over-group
dimension selection (Q2), multi-way n:m joins with disjunctive dimension
pairs (Q7), conditional market-share ratios (Q8), profit expressions
over 5 tables (Q9), HAVING vs a global scalar (Q11), CASE-aggregation
(Q12), left-outer count distribution (Q13), argmax-vs-scalar-subquery
(Q15), OR-of-ANDs pushdown (Q19), nested semi-join chains (Q20), and
anti-join + uncorrelated-average filters (Q22).

All money math follows the exact-integer-cents convention
(functions/exact.py); integer comparisons replace divisions wherever a
threshold-vs-average test appears, so both engines compare bit-identical
int64s.  Every LIMIT carries a fully tie-broken ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.exact import cents, dollars
from ..model import load_table
from ..registry import register

# DuckDB twins of the cents-product expressions (same as relational.py).
_SQL_PRICE_C = "CAST(round(l_extendedprice*100) AS BIGINT)"
_SQL_DISC_C = "CAST(round((1-l_discount)*100) AS BIGINT)"
_SQL_REVENUE = f"CAST(sum({_SQL_PRICE_C} * {_SQL_DISC_C}) AS BIGINT) / 10000.0"


def _disc_price_c():
    return cents("l_extendedprice") * F.round((1 - F.col("l_discount")) * 100).cast("long")


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier.  No partsupp → supply cost is the minimum
# observed unit price (cents div qty, exact integer division) a supplier
# charged for the part in lineitem.
# --------------------------------------------------------------------------


@register(
    "q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             min({_SQL_PRICE_C} // CAST(round(l_quantity) AS BIGINT)) AS unit_cost_c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
      SELECT p.p_partkey, p.p_name, s.s_name, s.s_acctbal, n.n_name,
             sp.unit_cost_c,
             min(sp.unit_cost_c) OVER (PARTITION BY p.p_partkey) AS best_c
      FROM supply sp
        JOIN part p ON sp.l_partkey = p.p_partkey
        JOIN supplier s ON sp.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
           unit_cost_c / 100.0 AS unit_cost
    FROM eligible WHERE unit_cost_c = best_c
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("join", "window"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) offering
    the minimum cost, Europe-scoped.  The correlated min-subquery is
    decorrelated into a window-min over the part key; the three dimension
    tables broadcast.  Cost = min unit price (exact integer cents div
    qty) from lineitem — partsupp stand-in."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    unit_cost_c = F.expr(
        "CAST(round(l_extendedprice*100) AS BIGINT) div CAST(round(l_quantity) AS BIGINT)"
    )
    supply = (
        li.select("l_partkey", "l_suppkey", unit_cost_c.alias("row_cost_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("row_cost_c").alias("unit_cost_c"))
    )
    eligible = (
        supply.join(F.broadcast(part), supply.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .withColumn("best_c", F.min("unit_cost_c").over(Window.partitionBy("p_partkey")))
    )
    return (
        eligible.filter(F.col("unit_cost_c") == F.col("best_c"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            dollars(F.col("unit_cost_c")).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations, by year.
# --------------------------------------------------------------------------


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           {_SQL_REVENUE} AS revenue
    FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n1.n_name, n2.n_name, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship
    year.  Two independent paths to `nation` (supplier side and customer
    side) with a disjunctive pair filter — the fact table shuffles once
    per n:m join, all dimensions broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg((F.sum(_disc_price_c()) / F.lit(10000.0)).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8: national market share within a region's market for one part type.
# --------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
                         THEN {_SQL_PRICE_C} * {_SQL_DISC_C}
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT)
             / CAST(CAST(sum({_SQL_PRICE_C} * {_SQL_DISC_C}) AS BIGINT) AS DOUBLE)
             AS mkt_share
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      JOIN region r ON n2.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'ECONOMY' AND r.r_name = 'AMERICA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
    ORDER BY o_year
    """,
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: the target nation's share of a region's market for
    one part type, by order year — a conditional-sum ratio over an
    8-table join (two nation roles + region).  Both sums are exact int64
    cents-products; the share is ONE double division per group."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    vol = _disc_price_c()
    target_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("long")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_region") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg((F.sum(target_vol) / F.sum(vol).cast("double")).alias("mkt_share"))
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year.  No ps_supplycost → cost is
# the part's retail price (exact cents) per unit.
# --------------------------------------------------------------------------


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_SQL_PRICE_C} * {_SQL_DISC_C}
                    - CAST(round(p_retailprice*100) AS BIGINT) * 100
                      * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) / 10000.0
             AS sum_profit
    FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n_name, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (discounted revenue minus cost×qty) on
    parts matching a name pattern, grouped by supplier nation and order
    year.  Cost stand-in = p_retailprice (no partsupp).  The whole profit
    expression stays in one int64 unit (1e-4 dollars) until the final
    division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    profit_c = _disc_price_c() - cents("p_retailprice") * F.lit(100).cast("long") * F.round(
        F.col("l_quantity")
    ).cast("long")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_c) / F.lit(10000.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q11: important stock.  No partsupp → a part's "stock value" is the summed
# extended price its suppliers from one nation shipped; keep parts whose
# value exceeds 0.1% of the national total (integer cross-multiplication,
# no division).
# --------------------------------------------------------------------------


@register(
    "q11_important_stock",
    oracle=f"""
    WITH natline AS (
      SELECT l.l_partkey, {_SQL_PRICE_C} AS price_c
      FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_5'
    ),
    pervalue AS (
      SELECT l_partkey, CAST(sum(price_c) AS BIGINT) AS value_c
      FROM natline GROUP BY l_partkey
    ),
    total AS (SELECT CAST(sum(price_c) AS BIGINT) AS total_c FROM natline)
    SELECT l_partkey AS p_partkey, value_c / 100.0 AS stock_value
    FROM pervalue, total
    WHERE value_c * 1000 > total_c
    ORDER BY stock_value DESC, p_partkey
    """,
    tags=("join", "agg"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global scalar threshold
    (HAVING sum > fraction × total).  The total is a 1-row aggregate
    broadcast-cross-joined back; the threshold test is an integer
    cross-multiplication (value×1000 > total) so no float division enters
    the comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    natline = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(F.col("l_partkey"), cents("l_extendedprice").alias("price_c"))
    )
    pervalue = natline.groupBy("l_partkey").agg(F.sum("price_c").alias("value_c"))
    total = natline.agg(F.sum("price_c").alias("total_c"))
    return (
        pervalue.crossJoin(F.broadcast(total))
        .filter(F.col("value_c") * 1000 > F.col("total_c"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            dollars(F.col("value_c")).alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "p_partkey")
    )


# --------------------------------------------------------------------------
# Q12: priority counts among late shipments.  No l_shipmode/receiptdate →
# group by l_linestatus; "late" = shipped >90 days after order date.
# --------------------------------------------------------------------------


@register(
    "q12_late_priority_counts",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "agg"),
)
def q12_late_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional counts (high/low priority) over
    late-shipped lines in a one-year window, grouped by line status
    (shipmode stand-in).  The non-equi lateness predicate rides the equi
    join; both CASE sums fold in one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q13: distribution of orders-per-customer (left outer join keeps
# zero-order customers).
# --------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two stacked aggregations over a LEFT OUTER join —
    orders per customer (zero-order customers kept by the outer join,
    excluded-priority orders filtered in the join condition), then the
    histogram of those counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue — argmax vs scalar subquery.
# --------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_SQL_PRICE_C} * {_SQL_DISC_C}) AS BIGINT) AS rev_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    ),
    best AS (SELECT max(rev_c) AS best_c FROM revenue)
    SELECT s_suppkey, s_name, rev_c / 10000.0 AS total_revenue
    FROM revenue JOIN supplier ON supplier_no = s_suppkey, best
    WHERE rev_c = best_c
    ORDER BY s_suppkey
    """,
    tags=("join", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) whose quarterly revenue equals
    the maximum — the scalar-subquery max is a 1-row aggregate broadcast
    back against the per-supplier revenue (keeps ties, exactly like the
    reference formulation)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price_c()).alias("rev_c")
    )
    best = revenue.agg(F.max("rev_c").alias("best_c"))
    return (
        revenue.crossJoin(F.broadcast(best))
        .filter(F.col("rev_c") == F.col("best_c"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", (F.col("rev_c") / F.lit(10000.0)).alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q19: disjunctive brand/size/quantity predicates (OR-of-ANDs pushdown).
# --------------------------------------------------------------------------


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT {_SQL_REVENUE} AS revenue, count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of three (brand ∧ size ∧
    quantity) conjunctions.  The part-side conjuncts (brand/size) are
    pushed to the broadcast dimension scan as a common disjunction; the
    mixed fact/dim residual evaluates post-join in one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    pred = (
        ((brand == "Brand#1") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#2") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#3") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(pred)
        .agg(
            (F.sum(_disc_price_c()) / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# Q20: part-promotion suppliers.  No partsupp/availqty → a supplier
# qualifies when its 1997 shipped quantity of a 'small%' part exceeds half
# of that part's total 1997 shipments (integer ×2 comparison).
# --------------------------------------------------------------------------


@register(
    "q20_part_promotion_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      GROUP BY l_suppkey, l_partkey
    ),
    tot AS (
      SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty
      FROM shipped GROUP BY l_partkey
    ),
    cand AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh JOIN tot t ON sh.l_partkey = t.l_partkey
      WHERE sh.qty * 2 > t.total_qty
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (SELECT l_suppkey FROM cand)
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name IN
                          ('NATION_7','NATION_8','NATION_9'))
    ORDER BY s_suppkey
    """,
    tags=("join", "agg"),
)
def q20_part_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery chain decorrelated to semi
    joins — suppliers who dominated (>half of) a qualifying part's 1997
    shipments, restricted to a nation set.  partsupp.availqty stand-in =
    the part's total shipped quantity."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_7", "NATION_8", "NATION_9")
    )
    shipped = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("qty"))
    )
    tot = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("total_qty")
    )
    cand = (
        shipped.join(tot, shipped.l_partkey == tot.t_partkey)
        .filter(F.col("qty") * 2 > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(cand, supp.s_suppkey == cand.l_suppkey, "left_semi")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == nation.n_nationkey,
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q22: global sales opportunity.  No c_phone → "country code" is the
# customer's nation key; the average-balance threshold is an integer
# cross-multiplication (bal × n > total) so no division enters the filter.
# --------------------------------------------------------------------------


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal*100) AS BIGINT) AS bal_c
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    ),
    stats AS (
      SELECT CAST(sum(bal_c) AS BIGINT) AS sum_c, count(*) AS n
      FROM pool WHERE bal_c > 0
    )
    SELECT c_nationkey AS cntrycode,
           count(*) AS numcust,
           CAST(sum(bal_c) AS BIGINT) / 100.0 AS totacctbal
    FROM pool, stats
    WHERE bal_c * n > sum_c
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    tags=("join", "agg"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in a nation set with above-average
    balance and no RECENT orders — uncorrelated-average filter (1-row
    broadcast, integer cross-multiplied) plus a LEFT ANTI join for NOT
    EXISTS, aggregated per "country code" (nation key stand-in).  Every
    synthetic customer has at least one all-time order, so the inactivity
    window (no orders since 2000) keeps the anti join non-vacuous."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    pool = cust.select("c_custkey", "c_nationkey", cents("c_acctbal").alias("bal_c"))
    stats = pool.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("n")
    )
    return (
        pool.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_c") * F.col("n") > F.col("sum_c"))
        .join(orders, pool.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dollars(F.sum("bal_c")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
