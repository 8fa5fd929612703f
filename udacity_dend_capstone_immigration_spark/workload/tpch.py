"""Additional TPC-H query shapes adapted to the driver testdata star
schema (no partsupp table; no o_comment / l_commitdate / c_phone
columns — substituted with equivalent predicates on existing columns,
noted per query).

Each query exercises a distinct optimizer/execution pattern at scale:
existential semi-joins (Q4), multi-hop nation-pair joins (Q7),
conditional-aggregate market-share ratios (Q8), LIKE-filtered 5-table
profit rollups (Q9), top-k over a quarter of returns (Q10), two-way
conditional counts over a pushed-down
disjunction (Q12), outer-join count distributions (Q13), scalar-max
view selection (Q15), correlated-average filters (Q17), group-HAVING
IN-subqueries (Q18), disjunctive pushdown brackets (Q19),
multi-correlated EXISTS + NOT-EXISTS semi/anti self-joins (Q21), and
anti-join + scalar-threshold reporting (Q22). All aggregates use
the bit-portable decimal-sum forms from ``workload.base``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.workload.base import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
    table,
)


def _ts(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


# --- TPC-H Q4 shape (order priority checking): one year of orders,
# counted per priority when EXISTS a lineitem shipped >90 days after
# the order date (l_commitdate/l_receiptdate aren't in the testdata;
# ship-lag expresses the same existential semi-join with a
# non-equi residual). The semi-join keeps orders-side columns only —
# no fan-out however many late lineitems an order has. At 100 TB both
# date filters push to the scans and the semi-join shuffles just
# (orderkey, dates).
@query(
    "tpch_q4_late_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def tpch_q4_late_order_priority(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --- TPC-H Q7 shape (volume shipping): revenue flows between distinct
# (supplier nation, customer nation) pairs per ship year. The two
# nation copies broadcast (SF-invariant) off the one wide
# lineitem⋈orders exchange; supplier and customer scale with SF and
# are AQE-planned; the pair inequality prunes same-nation flow. Nation
# names are re-used from two broadcast copies — no self-join
# materialization.
@query(
    "tpch_q7_nation_trade_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_trade_volume(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    supp = table(spark, sf_dir, "supplier")
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # nation (25 rows, SF-invariant) is the only true dim → explicit
    # broadcast. supplier scales 10k×SF and customer 150k×SF — both are
    # left to AQE, which broadcasts at small SF and switches to a
    # shuffle join once they outgrow the threshold at 100 TB.
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --- TPC-H Q8 shape (national market share): one nation's share of a
# region's revenue for one part type, per order year (reference
# pattern: TPC-H spec Q8; p_type here is the testdata's categorical
# PROMO/ECONOMY/... column, the customer region is n_regionkey = 2,
# and the 2-year window is 1996-1997 within the testdata's date span).
# The share is a conditional-aggregate ratio: CASE WHEN supp_nation
# THEN volume ELSE 0 summed against total volume in the SAME hash
# aggregate — one pass, map-side-combinable, no second scan or
# self-join. Both sums are decimal-exact and the share is a single
# double division of two portable doubles (bit-portable vs DuckDB).
# Plan shape: date filter pushes to the orders scan, p_type to the
# part scan (pre-join selectivity 1/6); nation copies broadcast
# (25 rows); part/supplier/customer scale with SF and ride AQE-chosen
# joins off the one wide lineitem⋈orders exchange.
@query(
    "tpch_q8_market_share",
    oracle="""
    WITH flows AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE n1.n_regionkey = 2
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
          AND p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_7' THEN volume ELSE 0 END
                               AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(CAST(volume AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
               AS mkt_share,
           COUNT(*) AS n_flows
    FROM flows
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    cust = table(spark, sf_dir, "customer")
    n1 = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2).select(
        F.col("n_nationkey").alias("n1_key")
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    flows = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"), "left_semi")
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    nat_vol = F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return (
        flows.groupBy("o_year")
        .agg(
            (
                F.sum(nat_vol.cast("decimal(28,10)")).cast("double")
                / F.sum(F.col("volume").cast("decimal(28,10)")).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_flows"),
        )
        .orderBy("o_year")
    )


# --- TPC-H Q9 shape (product type profit): profit by supplier nation
# and order year for parts matching a name token (reference pattern:
# TPC-H spec Q9). The testdata has no partsupp, so ps_supplycost is
# proxied by 0.6 × p_retailprice (documented substitution — the join
# topology and aggregate shape, a 5-table star with a LIKE-filtered
# part and a two-key rollup, are what the query exercises; partsupp
# would only add a sixth equi-join on the same keys). Plan shape: the
# LIKE pushes to the part scan (1/8 selectivity), nation broadcasts,
# part/supplier ride AQE-chosen joins off the lineitem⋈orders
# exchange; the amount expression is decimal-summed for bit-portable
# comparison. Profit amounts can be negative — the decimal sum is
# sign-safe.
@query(
    "tpch_q9_profit_by_nation_year",
    oracle=f"""
    WITH profit AS (
        SELECT n_name AS nation,
               CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                   - 0.6 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%gear%'
    )
    SELECT nation, o_year, {sql_dsum("amount", "sum_profit")}
    FROM profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_profit_by_nation_year(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    supp = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nation = table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    profit = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        profit.groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


# --- TPC-H Q10 shape (returned item reporting): top 20 customers by
# revenue lost to returns in one quarter. The quarter filter pushes to
# the orders scan, the returnflag filter to lineitem; nation broadcasts;
# TakeOrderedAndProject caps the final sort at 20.
@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate <  TIMESTAMP '1996-10-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    # nation broadcasts (true dim); customer rides an AQE-chosen join —
    # broadcast at small SF, shuffle at 100 TB where it's lineitem/40
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    rev = j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return rev.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name").orderBy(
        F.desc("revenue"), F.asc("c_custkey")
    ).limit(20)


# --- TPC-H Q12 shape (shipping modes and order priority): for two
# ship categories, how many late lineitems came from high- vs
# low-priority orders (reference pattern: TPC-H spec Q12). The
# testdata has no l_shipmode / l_commitdate / l_receiptdate:
# l_returnflag IN ('A','R') stands in for the two-mode IN
# disjunction, and "late" is the Q4/Q21 ship-lag substitution
# l_shipdate > o_orderdate + 90 days, with the receipt-year window
# mapped onto l_shipdate. Plan shape: the IN list and the shipdate
# range both push to the lineitem scan (PushedFilters); the ship-lag
# residual evaluates on the join; the two CASE counts are conditional
# aggregates in ONE map-combinable hash aggregate over a 2-row group
# key — no second pass, no pivot. orders scales with SF and rides an
# AQE-chosen join.
@query(
    "tpch_q12_priority_by_shipcat",
    oracle="""
    SELECT l_returnflag AS ship_cat,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('A', 'R')
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def tpch_q12_priority_by_shipcat(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = table(spark, sf_dir, "orders")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(F.col("l_returnflag").alias("ship_cat"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("ship_cat")
    )


# --- TPC-H Q13 shape (customer order-count distribution): LEFT join so
# zero-order customers survive (the join predicate carries the
# priority filter — a WHERE would turn it inner), COUNT of the
# nullable side, then a second tiny aggregate over the counts. The
# first aggregate shuffles customer keys once; the distribution
# aggregate is dim-sized.
@query(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
             AND o_orderpriority = '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_count_distribution(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
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


# --- TPC-H Q15 shape (top supplier): revenue-per-supplier view over a
# quarter, then select the supplier(s) hitting the maximum. The max is
# a one-row broadcast (crossJoin) — no second scan of lineitem and no
# global sort. Revenue equality across engines is safe because both
# sides compute the identical decimal-sum double.
@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = table(spark, sf_dir, "supplier")
    # the max-filter output is ~1 row but supplier scales 10k×SF — so
    # broadcast only the one-row max; the supplier join is left to AQE,
    # which sees the tiny filtered side at runtime and broadcasts IT
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --- TPC-H Q17 shape (small-quantity-order revenue): average yearly
# revenue lost if small-quantity orders for one brand stopped. The
# correlated per-part average becomes one partkey aggregate joined
# back. Neither part nor the per-partkey aggregate is dim-sized at
# TPC-H scaling (part is 200k×SF; part_avg has one row per distinct
# partkey), so no forced broadcasts: the aggregate's lineitem input is
# first semi-joined to the brand-filtered parts — semantics-preserving
# since only brand parts survive the final join, and it shrinks the
# aggregate ~25× — and AQE picks broadcast-vs-shuffle per SF. The 0.2×
# threshold is a single deterministic double multiply on an
# identically-computed average, so the float comparison is
# bit-portable.
@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey AS pk, {sql_davg("l_quantity", "avg_qty")}
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
               / 7.0 AS avg_yearly,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN part_avg ON pk = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < 0.2 * avg_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    part_avg = (
        li.join(
            part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
        )
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(davg(F.col("l_quantity"), "avg_qty"))
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(part_avg, li.l_partkey == F.col("pk"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).cast("double") / 7.0).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- TPC-H Q18 shape (large-volume customers): orders whose total
# quantity exceeds a threshold, reported with customer detail. The
# HAVING filter runs on the lineitem-side aggregate BEFORE the joins —
# only qualifying orderkeys (46 at sf0.01) reach the orders/customer
# join, which then broadcasts. Quantity sums are exact decimals.
@query(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey AS bk, {sql_dsum("l_quantity", "sum_qty")}
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(28,10))) > 300
    )
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM big
    JOIN orders   ON o_orderkey = bk
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def tpch_q18_large_volume_customers(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("bk"))
        .agg(dsum(F.col("l_quantity"), "sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    # customer joins AQE-planned (HAVING already shrank the other side
    # to the qualifying orderkeys, so either strategy is cheap)
    return (
        big.join(orders, F.col("bk") == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


# --- TPC-H Q19 shape (disjunctive revenue brackets): three OR'd
# (brand, size, quantity) brackets over the part⋈lineitem join. The
# disjunction references both sides, so it can't fully push down — but
# the per-side bounds Catalyst derives (size BETWEEN 1 AND 15,
# quantity BETWEEN 1 AND 30, brand IN (...)) DO push to the scans,
# shrinking the join inputs before the residual OR evaluates.
@query(
    "tpch_q19_bracketed_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def tpch_q19_bracketed_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    # part scales 200k×SF — no forced broadcast; AQE picks per SF
    j = li.join(part, li.l_partkey == part.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    bracket = (
        ((b == "Brand#12") & s.between(1, 5) & (q >= 1) & (q <= 11))
        | ((b == "Brand#23") & s.between(1, 10) & (q >= 10) & (q <= 20))
        | ((b == "Brand#3") & s.between(1, 15) & (q >= 20) & (q <= 30))
    )
    return j.where(bracket).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- TPC-H Q21 shape (suppliers who kept waiting): late lineitems of
# finished multi-supplier orders where the supplier was the ONLY late
# one — the multi-correlated EXISTS + NOT-EXISTS pattern, the hardest
# join shape in the public suite (reference pattern: TPC-H spec Q21).
# l_commitdate/l_receiptdate aren't in the testdata; "late" is the Q4
# substitution l_shipdate > o_orderdate + 90 days (varies per lineitem
# within an order, so the per-supplier distinction is preserved). The
# one-nation filter of the spec is widened to one REGION of nations so
# the result is non-empty at smoke scale (sf0.001 has 10 suppliers).
# Plan shape: the EXISTS becomes a left_semi and the NOT EXISTS a
# left_anti self-join of lineitem, both keyed on l_orderkey with the
# supplier-inequality (and, for the anti, the late-date comparison
# against the probe row's o_orderdate) as non-equi RESIDUALS on the
# hash join — semi/anti never fan out however many lineitems an order
# has, and all three lineitem branches hash-partition on l_orderkey so
# the shuffles line up. Nation broadcasts (25 rows, SF-invariant);
# supplier scales 10k×SF and rides an AQE-chosen join;
# TakeOrderedAndProject caps the final (numwait DESC, s_name) sort at
# 100.
@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH l1 AS (
        SELECT l_orderkey, l_suppkey, o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM l1
    JOIN supplier ON s_suppkey = l1.l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 3
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    orders = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = table(spark, sf_dir, "lineitem")
    l1 = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("ok3"),
        F.col("l_suppkey").alias("sk3"),
        F.col("l_shipdate").alias("sd3"),
    )
    only_late = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("ok2")) & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3"))
            & (F.col("sd3") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
            "left_anti",
        )
    )
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    return (
        only_late.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


# --- TPC-H Q22 shape (idle high-balance customers): customers above
# the average positive balance with no recent orders, rolled up by
# nation (the testdata has no c_phone; nationkey plays the country
# code). The scalar average broadcasts from a one-row aggregate; the
# recency check is a LEFT ANTI join that shuffles only custkeys. Both
# engines compute the identical decimal-sum average, so the balance
# comparison is bit-portable.
@query(
    "tpch_q22_idle_customer_balance",
    oracle=f"""
    WITH avg_bal AS (
        SELECT {sql_davg("c_acctbal", "ab")} FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           {sql_dsum("c_acctbal", "totacctbal")}
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def tpch_q22_idle_customer_balance(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(davg(F.col("c_acctbal"), "ab"))
    recent = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= _ts("1999-01-01")
    )
    rich = cust.join(F.broadcast(avg_bal)).where(F.col("c_acctbal") > F.col("ab"))
    idle = rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
    return (
        idle.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("numcust"), dsum(F.col("c_acctbal"), "totacctbal"))
        .orderBy("c_nationkey")
    )


# --- TPC-H Q5 shape (local supplier volume): revenue from orders
# where the CUSTOMER's nation equals the lineitem SUPPLIER's nation,
# one region, one order year. The join graph is cyclic — customer
# reaches lineitem through orders AND must agree with supplier on
# nationkey — which Catalyst plans as four equi-joins plus the
# c_nationkey = s_nationkey residual folded into the supplier join.
# At 100 TB: the date filter pushes to the orders scan (1 year ≈ 1/7
# of rows), region⋈nation (25 rows, SF-invariant) broadcasts into
# supplier BEFORE the big join, so only ~1/5 of suppliers reach the
# wide lineitem⋈orders exchange; customer/supplier ride AQE.
@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    cust = table(spark, sf_dir, "customer")
    region_nations = (
        table(spark, sf_dir, "nation")
        .join(
            table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    # nation⋈region is SF-invariant (≤25 rows) → broadcast into
    # supplier first, pruning suppliers to the region before they meet
    # the lineitem exchange. The cyclic c_nationkey = s_nationkey
    # predicate rides the supplier join as an extra equi-condition.
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(region_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
    )
    return (
        j.groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# --- TPC-H Q2 shape (minimum-cost supplier): for each qualifying
# part, the region supplier(s) offering the minimum supply cost.
# The testdata has no partsupp table, so the part↔supplier relation
# is DERIVED from lineitem: ps_supplycost = MIN(l_extendedprice /
# l_quantity) per (partkey, suppkey) — double division, IEEE-identical
# in both engines, and MIN is exact (no accumulation) so the
# min-equality join-back compares bit-identical doubles. Plan shape:
# the very selective part filter (5 of 50 sizes × 1 of 6 types)
# semi-join-prunes lineitem BEFORE the supplycost aggregation — the
# correlated min is over region suppliers only, so filtering PARTS
# early cannot change any surviving part's min. The per-part min is a
# WINDOW min over the partkey partition (one shuffle; the oracle's
# groupBy+join-back form would execute the eu subtree twice unless
# ReuseExchange fires). nation⋈region broadcasts; part/supplier ride
# AQE. At 100 TB the big shuffles are (partkey,suppkey) agg then
# partkey window — both on pruned input.
@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
    WITH partsupp AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice / l_quantity) AS ps_supplycost
        FROM lineitem GROUP BY 1, 2
    ), eu AS (
        SELECT ps_partkey, ps_supplycost, s_acctbal, s_name, n_name
        FROM partsupp
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ), best AS (
        SELECT ps_partkey, MIN(ps_supplycost) AS min_cost FROM eu GROUP BY 1
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM eu
    JOIN best ON eu.ps_partkey = best.ps_partkey AND ps_supplycost = min_cost
    JOIN part ON p_partkey = eu.ps_partkey
    WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    part_f = (
        table(spark, sf_dir, "part")
        .where(F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_type") == "LARGE"))
        .select("p_partkey", "p_type")
    )
    li = table(spark, sf_dir, "lineitem").join(
        part_f.select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost")
    )
    region_nations = (
        table(spark, sf_dir, "nation")
        .join(
            table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    region_supp = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(region_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eu = ps.join(region_supp, ps.l_suppkey == region_supp.s_suppkey)
    w = Window.partitionBy("l_partkey")
    return (
        eu.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .join(part_f, F.col("l_partkey") == part_f.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost"
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --- TPC-H Q11 shape (important stock): per-part value restricted to
# one nation's suppliers, keeping parts whose value exceeds a fixed
# fraction of the nation total — an aggregate HAVING'd against a
# scalar subquery over ITSELF. No partsupp: value = Σ l_extendedprice
# over the nation's lineitems per part. Scale discipline: the global
# total is re-aggregated from the SMALL per-part result (|parts| rows,
# never a second lineitem scan) and broadcast as one row; the
# threshold compare stays in exact decimal: the group sum types as
# DECIMAL(38,10) in both engines, and ×1000 at that width would exceed
# precision 38 (Spark silently HALF_UP-rounds the product to a reduced
# scale; DuckDB keeps it exact) — so BOTH sides narrow the sum back to
# DECIMAL(28,10) first (values are orders of magnitude below the 18
# integer digits that leaves), making ×1000 exact at width 33 and the
# boundary decided identically; only the OUTPUT casts to double.
@query(
    "tpch_q11_important_part_value",
    oracle="""
    WITH val AS (
        SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS value_dec
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    ), tot AS (
        SELECT SUM(value_dec) AS total_dec FROM val
    )
    SELECT l_partkey, CAST(CAST(value_dec AS VARCHAR) AS DOUBLE) AS part_value
    FROM val, tot
    WHERE CAST(value_dec AS DECIMAL(28,10)) * 1000 > total_dec
    ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11_important_part_value(spark, sf_dir):
    nation7 = table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nation7_supp = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation7), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        nation7_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )
    # val feeds BOTH tot and the threshold join — without a checkpoint
    # the shared aggregate subtree executes twice (two lineitem scans;
    # ReuseExchange does not fire across different downstream subtrees).
    # The checkpointed result is SMALL (|parts| rows) — the documented
    # eager-decision contract for shared intermediates.
    val = (
        li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(28,10)")).alias("value_dec"))
        .localCheckpoint(eager=False)
    )
    tot = val.agg(F.sum("value_dec").alias("total_dec"))
    return (
        val.join(F.broadcast(tot))
        .where(
            F.col("value_dec").cast("decimal(28,10)") * 1000 > F.col("total_dec")
        )
        .select(
            "l_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# --- TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
# counts per (brand, type, size) for qualifying parts, excluding
# "complaint" suppliers via NOT IN. The part↔supplier relation derives
# from lineitem (no partsupp); the complaint predicate substitutes
# s_acctbal < 0 for the spec's comment LIKE (no s_comment column).
# Plan: the selective part filter joins lineitem FIRST (≈11% of
# parts survive: 7/50 sizes × 24/25 brands × 5/6 types), the
# complaint anti-join runs on the pruned rows, distinct-pairs collapse
# before the final group-agg. brand/type/size are functionally
# dependent on partkey, so the 5-column distinct equals distinct
# (partkey, suppkey) pairs. COUNT(DISTINCT) is the exact form — the
# group space is bounded (brands × types × sizes), so the two-phase
# distinct aggregate holds at 100 TB.
@query(
    "tpch_q16_supplier_relationship",
    oracle="""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_relationship(spark, sf_dir):
    part_f = (
        table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "MEDIUM")
            & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    complaints = (
        table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(part_f, F.col("l_partkey") == F.col("p_partkey"))
        .join(complaints, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
    )
    # no pre-distinct: count_distinct already dedups in the two-phase
    # aggregate — a distinct first would pay a second full exchange
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --- TPC-H Q20 shape (potential part promotion): suppliers in one
# region who, for some watched part (name prefix), shipped more of it
# in 1997 than in all other years combined — the spec's availqty >
# ½·yearly-demand EXISTS rewritten onto the derived part↔supplier
# relation: qty97 > ½·qty_all per (partkey, suppkey). Both sums are
# exact decimals from ONE conditional-aggregate pass (no second scan,
# no self-join); the ×2 compare narrows the DECIMAL(38,10) sum back
# to DECIMAL(28,10) first so the product stays inside precision 38 in
# both engines (same width argument as tpch_q11).
# The qualifying (part, supplier) set semi-joins supplier, so the
# output is supplier-sized however many parts qualify. Part-name
# prefix prunes lineitem before the agg; nation broadcasts.
@query(
    "tpch_q20_part_promotion_suppliers",
    oracle="""
    WITH pq AS (
        SELECT l_suppkey,
               SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                              AND l_shipdate <  TIMESTAMP '1998-01-01'
                             THEN l_quantity ELSE 0 END AS DECIMAL(28,10))) AS qty97,
               SUM(CAST(l_quantity AS DECIMAL(28,10))) AS qty_all
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'small%'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 3
      AND s_suppkey IN (SELECT l_suppkey FROM pq
                        WHERE CAST(qty97 AS DECIMAL(28,10)) * 2 > qty_all)
    ORDER BY s_name
    """,
)
def tpch_q20_part_promotion_suppliers(spark, sf_dir):
    watched = (
        table(spark, sf_dir, "part")
        .where(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    li = table(spark, sf_dir, "lineitem").join(
        watched, F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    in97 = (F.col("l_shipdate") >= _ts("1997-01-01")) & (
        F.col("l_shipdate") < _ts("1998-01-01")
    )
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(
            F.when(in97, F.col("l_quantity")).otherwise(0).cast("decimal(28,10)")
        ).alias("qty97"),
        F.sum(F.col("l_quantity").cast("decimal(28,10)")).alias("qty_all"),
    )
    surging = (
        pq.where(F.col("qty97").cast("decimal(28,10)") * 2 > F.col("qty_all"))
        .select("l_suppkey")
        .distinct()
    )
    region_nations = table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 3)
    supp = table(spark, sf_dir, "supplier").join(
        F.broadcast(region_nations),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp.join(surging, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
