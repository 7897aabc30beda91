"""The remaining TPC-H query shapes, adapted to this fixture's schema.

The reference engine has no relational surface at all (SURVEY.md
§2.3-2.6); tpch.py covers q1/q3/q4/q5/q6/q7/q10/q12/q14/q17/q19 shapes.
This module completes the canonical set — q2/q8/q9/q11/q13/q15/q16/
q18/q20/q21/q22 — adapted to the driver tables (there is no partsupp
table; supply-cost shapes are re-expressed over lineitem aggregates).

What each adds that tpch.py doesn't have:
- q2:  correlated scalar MIN subquery (decorrelated: agg + equality join)
- q8:  share-of-total per group via conditional aggregate ratio
- q9:  expression-derived profit with LIKE filter, two-dim grouping
- q11: HAVING against a global-total scalar subquery
- q13: outer join with an extra ON-clause predicate + agg-of-agg
- q15: view + "equal to MAX" scalar subquery (ties kept)
- q16: NOT IN subquery (anti join) under a multi-attribute distinct count
- q18: IN (GROUP BY ... HAVING) subquery over a large fact
- q20: nested semi-join chain over two aggregation levels
- q21: EXISTS + NOT EXISTS self-joins with a non-equi correlated term
- q22: scalar-average subquery + time-bounded anti join

Scale posture: every scalar subquery becomes a 1-row broadcast
(BroadcastNestedLoopJoin over a single row — no shuffle); semi/anti
self-joins shuffle on the join key only; all money math is exact
DECIMAL (functions/exact.py) so results are partition-order
independent, then surfaced as doubles.  Double *comparisons* (q11) are
IEEE ops on identical exact inputs — deterministic across engines;
only double *reductions* are banned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fortymhz_spark.functions.exact import dsum, money
from fortymhz_spark.queries.registry import Registry
from fortymhz_spark.sources.batch import load_table

reg = Registry()
QUERIES = reg.queries
ORACLE = reg.oracle


def _revenue() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(4,2)"
    )


# ---------------------------------------------------------------------------
# q2-shape — cheapest supplier per part (correlated scalar MIN subquery)
# ---------------------------------------------------------------------------
@reg.query(
    "q2_min_cost_supplier",
    oracle="""
    WITH minp AS (
      SELECT l_partkey AS mp_partkey, MIN(l_extendedprice) AS min_price
      FROM lineitem GROUP BY 1
    )
    SELECT p_partkey, p_name, s_name, CAST(min_price AS DOUBLE) AS min_price
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN minp     ON mp_partkey = l_partkey AND l_extendedprice = min_price
    WHERE p_size <= 10
    GROUP BY p_partkey, p_name, s_name, min_price
    ORDER BY p_partkey, s_name
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2 shape: ``WHERE price = (SELECT MIN(price) ... correlated)``
    expressed decorrelated — per-part MIN aggregate joined back on
    (partkey, price) equality, exactly the plan Catalyst's subquery
    decorrelation produces.  MIN over doubles is a comparison, not a
    reduction, so the equality join is exact.  The per-part aggregate
    and the fact re-join share the l_partkey shuffle key, so AQE plans
    one exchange reused by both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    minp = li.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(
            minp,
            (li.l_partkey == minp.mp_partkey)
            & (li.l_extendedprice == minp.min_price),
        )
        .join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .groupBy("p_partkey", "p_name", "s_name", "min_price")
        .agg(F.lit(1))
        .select("p_partkey", "p_name", "s_name", "min_price")
        .orderBy("p_partkey", "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q8-shape — national market share within a region, by year
# ---------------------------------------------------------------------------
@reg.query(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT
        EXTRACT(YEAR FROM o_orderdate)::INT AS order_year,
        CAST(l_extendedprice AS DECIMAL(12,2))
          * CAST(1 - l_discount AS DECIMAL(4,2)) AS volume,
        sn.n_name AS supp_nation
      FROM lineitem
      JOIN orders    ON o_orderkey = l_orderkey
      JOIN customer  ON c_custkey = o_custkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN region    ON r_regionkey = cn.n_regionkey
      JOIN supplier  ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA'
    )
    SELECT
      order_year,
      CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
               ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
        / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM rev
    GROUP BY order_year
    ORDER BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8 shape: one nation's share of a region's yearly trade —
    conditional aggregate over a 6-way star join, then ONE double
    division of two exact sums (bitwise portable)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _revenue()
    national = F.when(F.col("supp_nation") == "NATION_5", volume).otherwise(
        F.lit(0).cast("decimal(17,4)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("order_year"))
        .agg(
            (F.sum(national).cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("order_year")
    )


# ---------------------------------------------------------------------------
# q9-shape — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------
@reg.query(
    "q9_product_profit",
    oracle="""
    SELECT
      n_name AS nation,
      EXTRACT(YEAR FROM l_shipdate)::INT AS ship_year,
      CAST(SUM(
        CAST(l_extendedprice AS DECIMAL(12,2))
          * CAST(1 - l_discount AS DECIMAL(4,2))
        - CAST(p_retailprice AS DECIMAL(12,2))
          * CAST(l_quantity AS DECIMAL(12,2))
          * CAST(0.5 AS DECIMAL(4,2))
      ) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, ship_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 shape: per-line profit (revenue minus an imputed cost of
    half the part's retail price per unit — no partsupp table in this
    fixture), grouped by supplier nation and ship year, LIKE-filtered
    part names.  All-decimal line math keeps the distributed SUM
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cost = (
        money("p_retailprice")
        * money("l_quantity")
        * F.lit(0.5).cast("decimal(4,2)")
    )
    profit = _revenue() - cost
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(dsum(profit, "profit"))
        .orderBy("nation", "ship_year")
    )


# ---------------------------------------------------------------------------
# q11-shape — suppliers holding an outsized share of total line value
# ---------------------------------------------------------------------------
@reg.query(
    "q11_important_suppliers",
    oracle="""
    WITH sv AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS value
      FROM lineitem GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(value AS DOUBLE) AS total_value
    FROM sv JOIN supplier ON s_suppkey = l_suppkey
    WHERE CAST(value AS DOUBLE) * 101 > (SELECT CAST(SUM(value) AS DOUBLE) FROM sv)
    ORDER BY total_value DESC, s_suppkey
    """,
)
def q11_important_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11 shape: HAVING against a global-total scalar subquery
    (suppliers whose line value exceeds ~1/101 of the grand total —
    i.e. above average share).  The global total is a 1-row aggregate
    broadcast to every partition; the comparison is IEEE double ops on
    exact-decimal inputs, identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    sv = li.groupBy("l_suppkey").agg(
        F.sum(money("l_extendedprice") * money("l_quantity")).alias("value")
    )
    total = sv.agg(F.sum("value").cast("double").alias("grand_total"))
    return (
        sv.join(F.broadcast(total))
        .filter(F.col("value").cast("double") * 101 > F.col("grand_total"))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("value").cast("double").alias("total_value"),
        )
        .orderBy(F.desc("total_value"), F.asc("s_suppkey"))
    )


# ---------------------------------------------------------------------------
# q13-shape — distribution of customers by order count
# ---------------------------------------------------------------------------
@reg.query(
    "q13_order_count_distribution",
    oracle="""
    WITH co AS (
      SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority <> '1-URGENT'
      GROUP BY 1
    )
    SELECT n_orders, COUNT(*) AS n_customers
    FROM co
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 shape: outer join with a filtering predicate INSIDE the
    join condition (not a post-filter — that would drop the
    null-extended rows), then an aggregate of an aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    co = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        co.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


# ---------------------------------------------------------------------------
# q15-shape — top supplier(s) by quarterly revenue (= MAX, ties kept)
# ---------------------------------------------------------------------------
@reg.query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1 - l_discount AS DECIMAL(4,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15 shape: revenue view + ``= (SELECT MAX(...))`` scalar
    subquery, keeping ties.  Exact decimal on BOTH sides of the
    equality — a double-valued max-equality would be engine-fragile.
    The 1-row MAX is broadcast; no second shuffle of the view."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q16-shape — supplier diversity per part attribute, NOT IN exclusion
# ---------------------------------------------------------------------------
@reg.query(
    "q16_supplier_diversity",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_name LIKE '%07'
      )
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q16 shape: NOT IN over a non-null key column = left-anti
    join against the excluded-supplier set, under a multi-attribute
    COUNT(DISTINCT).  The excluded set is unhinted: at test SFs the
    planner broadcasts it by size; at 100 TB (where ~1% of a billion
    suppliers is no longer broadcastable) AQE picks the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%07"))
        .select("s_suppkey")
    )
    return (
        li.join(excluded, li.l_suppkey == excluded.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# q18-shape — large-volume orders (IN over GROUP BY ... HAVING)
# ---------------------------------------------------------------------------
@reg.query(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey AS bo_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem
      GROUP BY 1
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
    )
    SELECT c_custkey, c_name, o_orderkey,
           CAST(o_orderdate AS VARCHAR) AS o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum_qty AS DOUBLE) AS sum_qty
    FROM orders
    JOIN customer ON c_custkey = o_custkey
    JOIN big      ON bo_orderkey = o_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total line quantity clears a
    threshold — IN (SELECT ... GROUP BY ... HAVING) as an aggregate
    joined back to the fact.  The HAVING filter runs map-side-partial
    first, so only qualifying orderkeys reach the join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bo_orderkey"))
        .agg(F.sum(money("l_quantity")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > F.lit(250).cast("decimal(12,2)"))
    )
    return (
        orders.join(big, orders.o_orderkey == big.bo_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q20-shape — suppliers holding a significant share of a part's volume
# ---------------------------------------------------------------------------
@reg.query(
    "q20_part_share_suppliers",
    oracle="""
    WITH per_ps AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    per_p AS (
      SELECT l_partkey AS pp_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2)) AS tq
      FROM lineitem GROUP BY 1
    )
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM per_ps
      JOIN per_p ON pp_partkey = l_partkey
      JOIN part  ON p_partkey = l_partkey
      WHERE p_type = 'PROMO' AND q * 10 > tq
    )
    ORDER BY s_suppkey
    """,
)
def q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20 shape: nested semi-join chain — suppliers who shipped
    >10% of some PROMO part's total volume.  Two aggregation levels
    over the same fact share the l_partkey shuffle; the supplier-key
    set reaches the dimension as a semi join (no row duplication).
    The ×10 threshold is multiplied out so the comparison stays in
    exact decimals (q17's pattern)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    per_ps = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(money("l_quantity")).cast("decimal(20,2)").alias("q")
    )
    per_p = li.groupBy(F.col("l_partkey").alias("pp_partkey")).agg(
        F.sum(money("l_quantity")).cast("decimal(20,2)").alias("tq")
    )
    qualifying = (
        per_ps.join(per_p, per_ps.l_partkey == per_p.pp_partkey)
        .join(part, per_ps.l_partkey == part.p_partkey)
        .filter(F.col("q") * 10 > F.col("tq"))
        .select("l_suppkey")
    )
    return (
        supp.join(qualifying, supp.s_suppkey == qualifying.l_suppkey, "left_semi")
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q21-shape — suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------
@reg.query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders      ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21 shape: the sole late shipper in multi-supplier orders —
    an EXISTS (left-semi) plus a correlated NOT EXISTS (left-anti)
    whose condition references a column of the outer block
    (o_orderdate) in a non-equi term.  Both self-joins hash on
    l_orderkey, so the fact shuffles once and the semi/anti probes
    reuse the partitioning under AQE."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    late_cutoff = F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    l1 = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > late_cutoff
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    l3 = li.select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
        F.col("l_shipdate").alias("l3_shipdate"),
    )
    waiting = l1.join(
        l2,
        (F.col("l_orderkey") == F.col("l2_orderkey"))
        & (F.col("l_suppkey") != F.col("l2_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l_orderkey") == F.col("l3_orderkey"))
        & (F.col("l_suppkey") != F.col("l3_suppkey"))
        & (F.col("l3_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_anti",
    )
    return (
        waiting.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# q22-shape — wealthy customers gone quiet (avg subquery + anti join)
# ---------------------------------------------------------------------------
@reg.query(
    "q22_wealthy_inactive_customers",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT
      (c_nationkey % 5)::INT AS nation_band,
      COUNT(*) AS numcust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1998-06-01'
      )
    GROUP BY 1
    ORDER BY 1
    """,
)
def q22_wealthy_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22 shape: customers with above-average balance and no
    recent orders, grouped into nation bands.  (The classic q22 anti-
    joins ALL orders; this fixture's every customer has some order, so
    the anti join is time-bounded — which also pushes the date filter
    into the orders scan.)  The average is davg's exact pattern: one
    double division of an exact decimal sum, broadcast as a 1-row
    frame."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1998-06-01").cast("timestamp")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
        )
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).cast("int").alias("nation_band"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(money("c_acctbal"), "totacctbal"),
        )
        .orderBy("nation_band")
    )


# ---------------------------------------------------------------------------
# pivot / unpivot (wide↔long reshaping)
# ---------------------------------------------------------------------------
@reg.query(
    "q_pivot_flag_by_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS qty_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_pivot_flag_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide reshaping: quantity totals and row counts pivoted by
    ``l_linestatus``.  Pivot values are DECLARED (['F','O']) — an
    undeclared pivot runs an extra distinct-values job and, at 100 TB,
    can explode into thousands of columns; declaring the domain keeps
    it one partial+final aggregate, same shuffle profile as a plain
    groupBy.  Decimal sums keep the doubles oracle-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return out.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_F"),
        F.col("O_qty").alias("qty_O"),
        F.col("F_n").alias("n_F"),
        F.col("O_n").alias("n_O"),
    ).orderBy("l_returnflag")


@reg.query(
    "q_unpivot_part_sizes",
    oracle="""
    WITH wide AS (
      SELECT p_brand,
             CAST(SUM(CASE WHEN p_size < 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS small_parts,
             CAST(SUM(CASE WHEN p_size >= 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS large_parts
      FROM part GROUP BY p_brand
    )
    SELECT p_brand, size_class, n_parts
    FROM wide
    UNPIVOT (n_parts FOR size_class IN (small_parts, large_parts))
    ORDER BY p_brand, size_class
    """,
)
def q_unpivot_part_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (melt): per-brand small/large part counts
    unpivoted to (brand, size_class, n_parts) rows.  ``unpivot`` is a
    zero-shuffle generator over the already-aggregated wide relation —
    the reshape itself moves no data."""
    part = load_table(spark, sf_dir, "part")
    wide = part.groupBy("p_brand").agg(
        F.sum(F.when(F.col("p_size") < 20, 1).otherwise(0))
        .cast("long")
        .alias("small_parts"),
        F.sum(F.when(F.col("p_size") >= 20, 1).otherwise(0))
        .cast("long")
        .alias("large_parts"),
    )
    return wide.unpivot(
        "p_brand", ["small_parts", "large_parts"], "size_class", "n_parts"
    ).orderBy("p_brand", "size_class")
