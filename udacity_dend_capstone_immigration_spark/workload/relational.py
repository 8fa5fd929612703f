"""Relational-core queries (SURVEY.md §2.1-2.8) on the TPC-H-ish star.

Each query is the testdata transposition of a reference operator —
citations point at the reference construct it re-expresses. Spark plans
stay declarative: tiny dims are explicitly ``broadcast()``-ed, every
aggregate is a hash aggregate with map-side partials, top-k compiles to
``TakeOrderedAndProject``.
"""

from __future__ import annotations

import atexit
import shutil

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.functions.cleaning import (
    invalid_country_to_na,
    port_city,
    port_state_code,
    valid_birth_year,
)
from udacity_dend_capstone_immigration_spark.functions.dates import sas_date_to_date
from udacity_dend_capstone_immigration_spark.operators.topk import top_k, top_k_per_group
from udacity_dend_capstone_immigration_spark.workload.base import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
    table,
)


# --- flagship: reference notebook cell 45 ("most visited cities in April")
# transposed: most-ordering nations in January 1996.
# Operators: S2 scan, P8 month filter, A2 group-count, T1 top-k, J4 dim
# join, T2 re-sort.
@query(
    "top_nations_by_orders",
    oracle="""
    WITH top_nations AS (
        SELECT c_nationkey AS nationkey,
               COUNT(*) AS order_cnt,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-02-01'
        GROUP BY c_nationkey
        ORDER BY order_cnt DESC, nationkey ASC
        LIMIT 10
    )
    SELECT n_name AS nation, order_cnt, total_revenue
    FROM top_nations JOIN nation ON nationkey = n_nationkey
    ORDER BY order_cnt DESC, nation ASC
    """,
)
def top_nations_by_orders(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    month = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-02-01"))
    )
    counted = (
        month.join(customer, month.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("order_cnt"), dsum(F.col("o_totalprice"), "total_revenue"))
    )
    top = top_k(counted, [F.desc("order_cnt"), F.asc("nationkey")], 10)
    return (
        top.join(F.broadcast(nation), top.nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "order_cnt", "total_revenue")
        .orderBy(F.desc("order_cnt"), F.asc("nation"))
    )


# --- star-schema fact build: reference etl.py:291-324 (J1 left joins to
# dims + P6 null rejection ⇒ net inner; P3 19-col rename projection).
@query(
    "fact_denormalize",
    oracle="""
    SELECT l_orderkey AS fact_id, l_linenumber AS line_no,
           o_orderdate AS order_ts, o_orderstatus AS status,
           c_name AS customer_name, n_name AS nation_name,
           p_name AS part_name, s_name AS supplier_name,
           l_quantity AS qty, l_extendedprice AS price
    FROM lineitem
        LEFT JOIN orders ON o_orderkey = l_orderkey
        LEFT JOIN customer ON c_custkey = o_custkey
        LEFT JOIN nation ON n_nationkey = c_nationkey
        LEFT JOIN part ON p_partkey = l_partkey
        LEFT JOIN supplier ON s_suppkey = l_suppkey
    WHERE o_orderkey IS NOT NULL AND c_custkey IS NOT NULL
      AND n_nationkey IS NOT NULL AND p_partkey IS NOT NULL
      AND s_suppkey IS NOT NULL
    """,
)
def fact_denormalize(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part")
    supplier = table(spark, sf_dir, "supplier")
    joined = (
        # nation (25 rows) is the only SF-invariant dim → explicit
        # broadcast; customer/part/supplier scale linearly with SF
        # (150k/200k/10k ×SF) and ride AQE-chosen joins — broadcast at
        # small SF, shuffle once they outgrow the threshold at 100 TB
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left")
        .join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
        .join(part, li.l_partkey == part.p_partkey, "left")
        .join(supplier, li.l_suppkey == supplier.s_suppkey, "left")
        .where(
            F.col("o_orderkey").isNotNull()
            & F.col("c_custkey").isNotNull()
            & F.col("n_nationkey").isNotNull()
            & F.col("p_partkey").isNotNull()
            & F.col("s_suppkey").isNotNull()
        )
    )
    return joined.select(
        F.col("l_orderkey").alias("fact_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("o_orderdate").alias("order_ts"),
        F.col("o_orderstatus").alias("status"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("nation_name"),
        F.col("p_name").alias("part_name"),
        F.col("s_name").alias("supplier_name"),
        F.col("l_quantity").alias("qty"),
        F.col("l_extendedprice").alias("price"),
    )


# --- multi-SUM hash aggregate: reference etl.py:336-347 (A1), in TPC-H
# Q1 pricing-summary shape.
@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base_price"),
        dsum(disc_price, "sum_disc_price"),
        dsum(charge, "sum_charge"),
        davg(F.col("l_quantity"), "avg_qty"),
        davg(F.col("l_extendedprice"), "avg_price"),
        davg(F.col("l_discount"), "avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# --- reference notebook cell 46 (top origin countries) transposed:
# top-10 parts by shipped quantity, dim join after the top-k.
@query(
    "top_parts_by_quantity",
    oracle="""
    WITH top_parts AS (
        SELECT l_partkey,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_qty,
               COUNT(*) AS shipment_cnt
        FROM lineitem
        GROUP BY l_partkey
        ORDER BY total_qty DESC, l_partkey ASC
        LIMIT 10
    )
    SELECT p_name AS part_name, p_brand AS brand, total_qty, shipment_cnt
    FROM top_parts JOIN part ON l_partkey = p_partkey
    ORDER BY total_qty DESC, part_name ASC
    """,
)
def top_parts_by_quantity(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    counted = li.groupBy("l_partkey").agg(
        dsum(F.col("l_quantity"), "total_qty"), F.count(F.lit(1)).alias("shipment_cnt")
    )
    top = top_k(counted, [F.desc("total_qty"), F.asc("l_partkey")], 10)
    # broadcast the BOUNDED side (top-10) into the SF-scaling part
    # table, not the other way round — part is 200k×SF
    return (
        part.join(F.broadcast(top), top.l_partkey == part.p_partkey)
        .select(
            F.col("p_name").alias("part_name"),
            F.col("p_brand").alias("brand"),
            "total_qty",
            "shipment_cnt",
        )
        .orderBy(F.desc("total_qty"), F.asc("part_name"))
    )


# --- reference notebook cell 47 (top student-visa origin countries):
# constant predicate on a category column + group-count + top-k + dim join.
@query(
    "top_nations_building_segment",
    oracle="""
    WITH seg AS (
        SELECT c_nationkey, COUNT(*) AS customer_cnt,
               CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_balance
        FROM customer
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY c_nationkey
        ORDER BY customer_cnt DESC, c_nationkey ASC
        LIMIT 10
    )
    SELECT n_name AS nation, customer_cnt, total_balance
    FROM seg JOIN nation ON c_nationkey = n_nationkey
    ORDER BY customer_cnt DESC, nation ASC
    """,
)
def top_nations_building_segment(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    seg = (
        customer.where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("customer_cnt"), dsum(F.col("c_acctbal"), "total_balance"))
    )
    top = top_k(seg, [F.desc("customer_cnt"), F.asc("c_nationkey")], 10)
    return (
        top.join(F.broadcast(nation), top.c_nationkey == nation.n_nationkey)
        .select(F.col("n_name").alias("nation"), "customer_cnt", "total_balance")
        .orderBy(F.desc("customer_cnt"), F.asc("nation"))
    )


# --- case-insensitive expression-key join: reference etl.py:355-356 (J3).
@query(
    "case_insensitive_join",
    oracle="""
    WITH dim AS (SELECT DISTINCT upper(n_name) AS nation_uc, n_nationkey FROM nation)
    SELECT dim.nation_uc AS nation, COUNT(*) AS customer_cnt
    FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN dim ON lower(dim.nation_uc) = lower(n_name)
    GROUP BY dim.nation_uc
    """,
)
def case_insensitive_join(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    dim = nation.select(
        F.upper("n_name").alias("nation_uc"), F.col("n_nationkey").alias("dim_key")
    ).distinct()
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(dim), F.lower(dim.nation_uc) == F.lower(nation.n_name))
        .groupBy(F.col("nation_uc").alias("nation"))
        .agg(F.count(F.lit(1)).alias("customer_cnt"))
    )


# --- anti-join idiom: reference notebook cell 22 (J5) — rows in A with
# no match in B, as a proper left_anti.
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# --- cross-type-cast equi-join: reference etl.py:313-317 (J2/F7) — string
# dim codes joined to numeric fact columns under ANSI-off implicit
# coercion (pinned by pin_session).
@query(
    "cross_type_join",
    oracle="""
    WITH dim AS (SELECT CAST(n_nationkey AS VARCHAR) AS code, n_name FROM nation)
    SELECT n_name AS nation, COUNT(*) AS supplier_cnt
    FROM supplier JOIN dim ON CAST(code AS INT) = s_nationkey
    GROUP BY n_name
    """,
)
def cross_type_join(spark, sf_dir):
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    dim = nation.select(F.col("n_nationkey").cast("string").alias("code"), "n_name")
    # implicit string↔int coercion, exactly the reference's J2 semantics
    return (
        supplier.join(F.broadcast(dim), dim.code == supplier.s_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
    )


# --- SQL-string filter + null rejection: reference etl.py:272-275 (P5)
# and etl.py:318-323 (P6).
@query(
    "filter_sql_predicate",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation
    WHERE n_name != 'NATION_3' AND n_regionkey IS NOT NULL
    """,
)
def filter_sql_predicate(spark, sf_dir):
    nation = table(spark, sf_dir, "nation")
    return nation.filter("n_name != 'NATION_3'").where(F.col("n_regionkey").isNotNull())


# --- regex cleanup + lower: reference etl.py:266-269 (F4) + F5.
@query(
    "regex_clean_types",
    oracle="""
    SELECT p_partkey,
           regexp_replace(p_type, '^PROMO.*|^ECONOMY.*', 'NA', 'g') AS type_cleaned,
           lower(p_brand) AS brand_lc
    FROM part
    """,
)
def regex_clean_types(spark, sf_dir):
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_replace("p_type", "^PROMO.*|^ECONOMY.*", "NA").alias("type_cleaned"),
        F.lower("p_brand").alias("brand_lc"),
    )


# --- SAS-date conversion incl. the falsy-zero quirk: reference
# etl.py:236,240-241 (F1). l_suppkey 0 exercises day-0 → null.
@query(
    "sas_date_convert",
    oracle="""
    SELECT DISTINCT l_suppkey AS day_offset,
           CASE WHEN l_suppkey IS NULL OR l_suppkey = 0 THEN NULL
                ELSE DATE '1960-01-01' + CAST(l_suppkey AS INT) END AS converted_date
    FROM lineitem
    """,
)
def sas_date_convert(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_suppkey").alias("day_offset"),
        sas_date_to_date(F.col("l_suppkey"), compat_falsy_zero=True).alias("converted_date"),
    ).distinct()


# --- port-name split: reference etl.py:252-263 (F3) — 'City, ST' split
# with missing-comma → null state; P7 dropna analog kept visible.
@query(
    "port_name_split",
    oracle="""
    WITH src AS (
        SELECT n_nationkey,
               CASE WHEN n_nationkey % 3 = 0 THEN n_name
                    ELSE n_name || ', ' || r_name END AS port_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
    )
    SELECT n_nationkey, port_name,
           trim(string_split(port_name, ',')[1]) AS city,
           CASE WHEN len(string_split(port_name, ',')) > 1
                THEN trim(string_split(port_name, ',')[2]) END AS state_code
    FROM src
    """,
)
def port_name_split(spark, sf_dir):
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    src = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey).select(
        "n_nationkey",
        F.when(F.col("n_nationkey") % 3 == 0, F.col("n_name"))
        .otherwise(F.concat(F.col("n_name"), F.lit(", "), F.col("r_name")))
        .alias("port_name"),
    )
    return src.select(
        "n_nationkey",
        "port_name",
        port_city("port_name").alias("city"),
        port_state_code("port_name").alias("state_code"),
    )


# --- birth-year range validation: reference etl.py:237,242 (F2),
# inclusive 1900/2016 bounds over a synthesized year column.
@query(
    "birth_year_validation",
    oracle="""
    SELECT o_orderkey,
           1880 + o_orderkey % 150 AS raw_year,
           CASE WHEN 1880 + o_orderkey % 150 BETWEEN 1900 AND 2016
                THEN CAST(1880 + o_orderkey % 150 AS INT) END AS valid_year
    FROM orders
    """,
)
def birth_year_validation(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    raw = (F.lit(1880) + F.col("o_orderkey") % 150).alias("raw_year")
    return orders.select(
        "o_orderkey", raw, valid_birth_year(F.lit(1880) + F.col("o_orderkey") % 150).alias("valid_year")
    )


# --- country-name regex invalidation on a dim: reference etl.py:266-269,
# applied to its own pattern (F4 exact semantics).
@query(
    "invalid_label_to_na",
    oracle="""
    SELECT s_suppkey,
           regexp_replace(
               CASE WHEN s_suppkey % 5 = 0 THEN 'No Country Code (' || s_name || ')'
                    WHEN s_suppkey % 7 = 0 THEN 'INVALID: ' || s_name
                    WHEN s_suppkey % 11 = 0 THEN 'Collapsed (' || s_name || ')'
                    ELSE s_name END,
               '^No Country.*|INVALID.*|Collapsed.*', 'NA', 'g') AS label
    FROM supplier
    """,
)
def invalid_label_to_na(spark, sf_dir):
    supplier = table(spark, sf_dir, "supplier")
    raw = (
        F.when(F.col("s_suppkey") % 5 == 0, F.concat(F.lit("No Country Code ("), F.col("s_name"), F.lit(")")))
        .when(F.col("s_suppkey") % 7 == 0, F.concat(F.lit("INVALID: "), F.col("s_name")))
        .when(F.col("s_suppkey") % 11 == 0, F.concat(F.lit("Collapsed ("), F.col("s_name"), F.lit(")")))
        .otherwise(F.col("s_name"))
    )
    return supplier.select("s_suppkey", invalid_country_to_na(raw).alias("label"))


# --- top-k per group via window: SURVEY.md §2.5 — the idiomatic
# generalization the reference lacked.
@query(
    "top_customers_per_nation",
    oracle="""
    SELECT n_name AS nation, c_name AS customer_name, c_acctbal AS balance, rank
    FROM (
        SELECT c_nationkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rank
        FROM customer
    ) ranked JOIN nation ON c_nationkey = n_nationkey
    WHERE rank <= 3
    """,
)
def top_customers_per_nation(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    ranked = top_k_per_group(
        customer,
        partition_by=["c_nationkey"],
        order_by=[F.desc("c_acctbal"), F.asc("c_custkey")],
        k=3,
    )
    return ranked.join(F.broadcast(nation), ranked.c_nationkey == nation.n_nationkey).select(
        F.col("n_name").alias("nation"),
        F.col("c_name").alias("customer_name"),
        F.col("c_acctbal").alias("balance"),
        "rank",
    )


# --- distinct counts: reference etl.py:391-408 + notebook cells 14,18-21
# (A4), per-group form.
@query(
    "distinct_counts_per_segment",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(DISTINCT c_nationkey) AS distinct_nations,
           COUNT(*) AS customer_cnt
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def distinct_counts_per_segment(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    return customer.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.countDistinct("c_nationkey").alias("distinct_nations"),
        F.count(F.lit(1)).alias("customer_cnt"),
    )


# --- duplicate elimination over a projection: reference etl.py:243 (A5).
@query(
    "dedup_exact_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
    FROM lineitem
    """,
)
def dedup_exact_rows(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus", "l_shipdate").dropDuplicates()


# --- non-emptiness counts in one pass: reference etl.py:369-388 (A3) —
# restructured from 7 separate count() jobs into one union (the §4
# caching/reuse fix).
@query(
    "table_row_counts",
    oracle="""
    SELECT 'lineitem' AS table_name, COUNT(*) AS row_cnt FROM lineitem
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'customer', COUNT(*) FROM customer
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'region', COUNT(*) FROM region
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    """,
)
def table_row_counts(spark, sf_dir):
    dfs = []
    for name in ("lineitem", "orders", "customer", "nation", "region", "part", "supplier"):
        dfs.append(
            table(spark, sf_dir, name)
            .agg(F.count(F.lit(1)).alias("row_cnt"))
            .select(F.lit(name).alias("table_name"), "row_cnt")
        )
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


# --- DQ referential-consistency summary: reference etl.py:391-408
# (SURVEY.md §2.11) as data — per fact key, the reference's
# distinct-count comparison plus the subset-semantics orphan count the
# fixed DQCheck uses. One AQE-planned anti-join per key (broadcast at
# small SF, shuffle at 100 TB — the keysets scale with SF), no
# O(n log n) distinct jobs repeated per table.
@query(
    "dq_referential_summary",
    oracle="""
    SELECT 'l_orderkey' AS fact_key,
           (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS fact_distinct,
           (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS dim_distinct,
           (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN
                (SELECT o_orderkey FROM orders)) AS orphan_rows
    UNION ALL
    SELECT 'l_partkey',
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
           (SELECT COUNT(DISTINCT p_partkey) FROM part),
           (SELECT COUNT(*) FROM lineitem WHERE l_partkey NOT IN
                (SELECT p_partkey FROM part))
    UNION ALL
    SELECT 'l_suppkey',
           (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem),
           (SELECT COUNT(DISTINCT s_suppkey) FROM supplier),
           (SELECT COUNT(*) FROM lineitem WHERE l_suppkey NOT IN
                (SELECT s_suppkey FROM supplier))
    """,
)
def dq_referential_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    dims = {
        "l_orderkey": table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k")),
        "l_partkey": table(spark, sf_dir, "part").select(F.col("p_partkey").alias("k")),
        "l_suppkey": table(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("k")),
    }
    outs = []
    for key, dim in dims.items():
        # the dim keysets scale with SF (orders/part/supplier are not
        # dims at TPC-H ratios) — leave the anti-join to AQE, which
        # broadcasts at small SF and shuffles at 100 TB
        orphans = li.select(F.col(key).alias("k")).join(
            dim.distinct(), "k", "left_anti"
        )
        outs.append(
            li.agg(F.countDistinct(key).alias("fact_distinct"))
            .crossJoin(dim.agg(F.countDistinct("k").alias("dim_distinct")))
            .crossJoin(orphans.agg(F.count(F.lit(1)).alias("orphan_rows")))
            .select(
                F.lit(key).alias("fact_key"), "fact_distinct", "dim_distinct", "orphan_rows"
            )
        )
    out = outs[0]
    for d in outs[1:]:
        out = out.unionByName(d)
    return out


# --- SQL entry point (SURVEY.md §3 entry point 2): temp-view
# registration (S7) + spark.sql text query — the reference's notebook
# query path (cells 31, 45-47). Same ANTLR→Catalyst pipeline as the
# DataFrame API; this pins that the engine serves both surfaces.
@query(
    "sql_revenue_by_priority",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS order_cnt,
           {sql_dsum("o_totalprice", "total_revenue")}
    FROM orders
    WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
    GROUP BY o_orderpriority
    """,
)
def sql_revenue_by_priority(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.sources.readers import load_star

    load_star(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS order_cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,10))) AS DOUBLE) AS total_revenue
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
        GROUP BY o_orderpriority
        """
    )


# --- partitioned-sink round trip (S6): aggregate -> guardrailed
# partitioned parquet write -> read back. The oracle states the
# aggregate itself, so the driver's hash compare proves the write/read
# cycle is lossless (values, schema, partition-column round-trip).
@query(
    "partitioned_write_roundtrip",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS row_cnt,
           {sql_dsum("l_extendedprice", "total_price")}
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def partitioned_write_roundtrip(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet

    li = table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("row_cnt"), dsum(F.col("l_extendedprice"), "total_price")
    )
    out = tempfile.mkdtemp(prefix="roundtrip_")
    write_parquet(agg, out, partition_by=("l_returnflag",))
    back = spark.read.parquet(out)
    # partition columns come back typed as read; restore column order
    return back.select("l_returnflag", "l_linestatus", "row_cnt", "total_price")


# --- schema-evolution round trip (S6 extension): a table written by
# two producer generations (v1 has n_chars_v1, v2 replaced it with
# source_v2) must read back as ONE relation with the union schema and
# nulls where a generation lacked the column — Spark's mergeSchema
# footer union, the mechanism that lets a 100 TB lake table evolve
# without rewriting history. The oracle derives the same
# union-with-nulls from the source columns, so the driver's hash
# compare proves the two-generation write/merge-read cycle is lossless
# AND null-exact.
@query(
    "schema_evolution_roundtrip",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 2 = 0 THEN CAST(n_chars AS BIGINT) END AS n_chars_v1,
           CASE WHEN doc_id % 2 = 1 THEN source END AS source_v2
    FROM documents
    """,
)
def schema_evolution_roundtrip(spark, sf_dir):
    import tempfile

    docs = table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="schema_evo_")
    docs.where(F.col("doc_id") % 2 == 0).select(
        "doc_id", F.col("n_chars").alias("n_chars_v1")
    ).write.mode("overwrite").parquet(out)
    docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.col("source").alias("source_v2")
    ).write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.select("doc_id", "n_chars_v1", "source_v2")


#: (root, (table, table)) of the previous bucketed_join_roundtrip run,
#: retired lazily by the next run (see the query body) and swept at exit.
_BUCKETED_PREV: list = []


def _sweep_bucketed_dirs():
    while _BUCKETED_PREV:
        prev_root, _ = _BUCKETED_PREV.pop()
        shutil.rmtree(prev_root, ignore_errors=True)


atexit.register(_sweep_bucketed_dirs)


# --- bucketed co-located join (S6 extension): write BOTH fact tables
# hash-bucketed on the join key, then sort-merge-join them from the
# catalog with ZERO Exchange on either side — the layout a recurring
# 100 TB fact⋈fact join needs (neither side broadcast-able; without
# bucketing every run re-shuffles both tables). The oracle states the
# join aggregate over the ORIGINAL parquet, so the driver's hash
# compare proves the bucketed write/read/join cycle is lossless;
# tests/test_bucketing.py pins the shuffle-free plan shape (one
# Exchange total — the post-join aggregation — and both scans
# `Bucketed: true`). The merge hints force the 100 TB plan at test SFs
# too, where Catalyst would otherwise broadcast the small side.
@query(
    "bucketed_join_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS line_cnt,
           {sql_dsum("l_extendedprice", "total_price")}
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def bucketed_join_roundtrip(spark, sf_dir):
    import tempfile
    import uuid

    from udacity_dend_capstone_immigration_spark.sources.writers import write_bucketed

    n_buckets = 8
    # LAZY cleanup (r11 advice): the per-run tables can't be dropped in
    # this invocation — the returned DataFrame still reads them when the
    # driver collects it — so each invocation retires the PREVIOUS one's
    # catalog entries + external dirs instead. A long-lived process
    # (driver gate, bench min-of-2, pytest) holds at most ONE live pair;
    # atexit sweeps the last. DROP IF EXISTS is a no-op for entries made
    # in an already-ended session (in-memory catalog died with it).
    while _BUCKETED_PREV:
        prev_root, prev_tables = _BUCKETED_PREV.pop()
        for t in prev_tables:
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(prev_root, ignore_errors=True)
    root = tempfile.mkdtemp(prefix="bucketed_join_")
    # per-run table names (like the streaming queries' query names):
    # fixed names with a fresh mkdtemp path per invocation would orphan
    # the previous external location on every re-run and race two
    # concurrent sessions sharing a warehouse on the catalog entries
    uid = uuid.uuid4().hex[:8]
    ot, lt = f"bt_orders_{uid}", f"bt_lineitem_{uid}"
    _BUCKETED_PREV.append((root, (ot, lt)))
    write_bucketed(
        table(spark, sf_dir, "orders"),
        ot,
        f"{root}/{ot}",
        bucket_by=("o_orderkey",),
        num_buckets=n_buckets,
        sort_by=("o_orderkey",),
    )
    write_bucketed(
        table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice"),
        lt,
        f"{root}/{lt}",
        bucket_by=("l_orderkey",),
        num_buckets=n_buckets,
        sort_by=("l_orderkey",),
    )
    o = spark.table(ot)
    li = spark.table(lt)
    return (
        o.hint("merge")
        .join(li.hint("merge"), o["o_orderkey"] == li["l_orderkey"])
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1996-01-01").cast("date"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("line_cnt"),
            dsum(F.col("l_extendedprice"), "total_price"),
        )
    )


# --- ORC sink round trip: the partitioned-parquet roundtrip's twin on
# the OTHER bundled columnar format (the interchange format for
# Hive/Trino-resident consumers — sources/writers.py:write_orc shares
# the guardrail+compaction path). Same oracle discipline: the oracle
# states the aggregate, so the hash compare proves the ORC write/read
# cycle lossless including the partition-column round trip.
@query(
    "orc_write_roundtrip",
    oracle=f"""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS order_cnt,
           {sql_dsum("o_totalprice", "total_price")}
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def orc_write_roundtrip(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.writers import write_orc

    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("order_cnt"),
        dsum(F.col("o_totalprice"), "total_price"),
    )
    out = tempfile.mkdtemp(prefix="orc_roundtrip_")
    write_orc(agg, out, partition_by=("o_orderstatus",))
    back = spark.read.orc(out)
    return back.select("o_orderpriority", "o_orderstatus", "order_cnt", "total_price")


# --- write-audit-publish atomic table publish (S6 extension; the
# Delta-absent ACID pattern — sources/publish.py module doc). The query
# exercises the full lifecycle IN-ENGINE: publish a stale snapshot,
# have an audit VETO a broken one (readers keep the stale version
# through the failed attempt — that's the whole point of WAP), then
# publish the good snapshot and read it back through the pointer. The
# oracle states the good aggregate over the original parquet, so the
# driver's hash compare proves (a) the vetoed junk never became
# visible and (b) the publish→resolve→read cycle is lossless.
# tests/test_publish.py additionally pins crash-between-stages and
# pointer-atomicity semantics.
@query(
    "atomic_publish_roundtrip",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           {sql_dsum("o_totalprice", "total_price")}
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def atomic_publish_roundtrip(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.plans.dq import DQError
    from udacity_dend_capstone_immigration_spark.sources.publish import (
        AuditFailedError,
        publish_table,
        read_published,
    )

    orders = table(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_cnt"),
        dsum(F.col("o_totalprice"), "total_price"),
    )
    root = tempfile.mkdtemp(prefix="wap_publish_")
    # 1: a stale-but-valid snapshot goes live
    publish_table(agg.where(F.col("o_orderpriority") == "1-URGENT"), root)
    # 2: a broken snapshot is VETOED by its audit — never published

    def full_coverage(staged):
        if staged.count() < 5:
            raise DQError("publish audit: expected all 5 priorities")

    try:
        publish_table(agg.limit(1), root, audit=full_coverage)
    except AuditFailedError:
        pass
    else:  # pragma: no cover - the audit contract itself failed
        raise AssertionError("audit should have vetoed the partial snapshot")
    # 3: the good snapshot passes its audit and atomically replaces v1
    publish_table(agg, root, audit=full_coverage)
    return read_published(spark, root).select(
        "o_orderpriority", "order_cnt", "total_price"
    )


# --- sketch path for 100 TB distinct counts: HLL approx_count_distinct.
# Sketch VALUES are engine-specific (DuckDB can't reproduce Spark's HLL),
# so the query is made self-validating instead of rows-only: it emits the
# exact distinct counts (oracle-verifiable) plus a within_bound flag
# asserting every sketch's relative error < 3×rsd — if a sketch ever
# drifts, the flag flips and the value hash fails. The accuracy bound is
# additionally pinned by tests/test_approx.py. The exact countDistincts
# make this an EXPAND plan — fine for a 1-row summary; at 100 TB you'd
# drop the exact columns and keep only the sketches.
@query(
    "approx_distinct_summary",
    oracle="""
    SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_suppliers,
           CAST(TRUE AS BOOLEAN) AS within_bound
    FROM lineitem
    """,
)
def approx_distinct_summary(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    rsd = 0.02
    # Two SEPARATE passes, cross-joined (1 row × 1 row): mixing several
    # COUNT(DISTINCT) with approx_count_distinct in ONE aggregate makes
    # Catalyst route the HLL updates through the Expand it plans for the
    # distinct columns — measured 30.5s vs 1.7s + 1.5s for the split
    # aggregates at sf0.1 (~19× slower for identical results). Two scans
    # of one column-pruned table beat one scan through an Expand.
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
    )
    approx = li.agg(
        F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd).alias("approx_suppliers"),
    )
    agg = exact.crossJoin(approx)

    def _ok(exact, approx):
        return (
            F.abs(F.col(approx) - F.col(exact)) / F.col(exact) < F.lit(3 * rsd)
        )

    return agg.select(
        "exact_orders",
        "exact_parts",
        "exact_suppliers",
        (
            _ok("exact_orders", "approx_orders")
            & _ok("exact_parts", "approx_parts")
            & _ok("exact_suppliers", "approx_suppliers")
        ).alias("within_bound"),
    )


# --- TPC-H Q5 shape: 6-table star join (lineitem ⋈ orders ⋈ customer ⋈
# supplier ⋈ nation ⋈ region) with the local-supplier predicate
# (c_nationkey = s_nationkey). The scale showcase for join planning:
# region/nation broadcast (tiny), supplier/customer broadcast at this sf
# but shuffle-join at 100 TB (AQE decides from runtime stats), and the
# year filter + region filter push into the scans so the big lineitem
# scan is the only full pass. Revenue per row is one double multiply
# (exact, order-free); the sum is decimal (dsum).
@query(
    "regional_supplier_revenue",
    oracle=f"""
    SELECT n_name AS nation,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1997-01-01'
    GROUP BY n_name
    """,
)
def regional_supplier_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return joined.groupBy(F.col("n_name").alias("nation")).agg(dsum(rev, "revenue"))


# --- column-level data profile (the DQ profiling operator): null
# counts, distinct counts, numeric and lexicographic extrema for every
# column of ``orders`` — computed in ONE scan as a single wide
# aggregate, then exploded into per-column rows (profiling 100 TB must
# not scan once per column; the oracle's UNION-ALL-per-column form is
# the readable equivalent, not the executable shape). Timestamps are
# profiled as epoch seconds to stay engine-portable.
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


def _profile_oracle() -> str:
    parts = []
    for c, kind in _PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            mn = f"CAST(epoch(MIN({c})) AS DOUBLE)"
            mx = f"CAST(epoch(MAX({c})) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"MIN({c})", f"MAX({c})"
        parts.append(
            f"SELECT '{c}' AS column_name, COUNT(*) AS n_rows,"
            f" COUNT({c}) AS n_nonnull, COUNT(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num, {ms} AS min_str, {xs} AS max_str"
            f" FROM orders"
        )
    return " UNION ALL ".join(parts)


@query("orders_column_profile", oracle=_profile_oracle())
def orders_column_profile(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    aggs, structs = [], []
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    # The count_distinct family goes in its OWN aggregate: multiple
    # distinct columns force an Expand (xN row multiplication), and any
    # plain agg in the same pass rides it — same ~19x pathology as
    # approx_distinct_summary. Split passes + 1-row cross join instead.
    nd_aggs = [
        F.count_distinct(F.col(c)).alias(f"{c}_nd") for c, _ in _PROFILE_COLS
    ]
    aggs.append(F.count(F.lit(1)).alias("_rows"))
    for c, kind in _PROFILE_COLS:
        aggs.append(F.count(F.col(c)).alias(f"{c}_nn"))
        if kind == "num":
            aggs += [
                F.min(c).cast("double").alias(f"{c}_mn"),
                F.max(c).cast("double").alias(f"{c}_mx"),
            ]
        elif kind == "ts":
            aggs += [
                (F.unix_micros(F.min(c).cast("timestamp")) / F.lit(1000000.0)).alias(f"{c}_mn"),
                (F.unix_micros(F.max(c).cast("timestamp")) / F.lit(1000000.0)).alias(f"{c}_mx"),
            ]
        else:
            aggs += [F.min(c).alias(f"{c}_ms"), F.max(c).alias(f"{c}_xs")]
    wide = orders.agg(*aggs).crossJoin(orders.agg(*nd_aggs))
    for c, kind in _PROFILE_COLS:
        structs.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("_rows").alias("n_rows"),
                F.col(f"{c}_nn").alias("n_nonnull"),
                F.col(f"{c}_nd").alias("n_distinct"),
                (F.col(f"{c}_mn") if kind != "str" else null_d).alias("min_num"),
                (F.col(f"{c}_mx") if kind != "str" else null_d).alias("max_num"),
                (F.col(f"{c}_ms") if kind == "str" else null_s).alias("min_str"),
                (F.col(f"{c}_xs") if kind == "str" else null_s).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


# --- TPC-H Q3 shape (shipping priority): segment-filtered 3-table join,
# revenue per order, top 10. Both date filters push into the scans;
# customer joins AQE-planned (the segment filter keeps 1/5 of a table
# that scales 150k×SF — broadcast at small SF only); the
# orders⋈lineitem join is the only wide exchange.
# TakeOrderedAndProject caps the sort.
@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")},
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark, sf_dir):
    cust = table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    # customer scales 150k×SF (the segment filter keeps 1/5 of it) —
    # not a broadcastable dim at 100 TB; AQE picks per SF
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        cust, orders.o_custkey == cust.c_custkey
    )
    rev = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )
    return rev.orderBy(
        F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey")
    ).limit(10)


# --- TPC-H Q6 shape (forecast revenue change): the pure scan-aggregate
# — every predicate is a pushable range filter, zero joins, zero
# shuffles beyond the final partial-agg merge. The pushdown showcase:
# at 100 TB this reads only row groups whose min/max stats overlap the
# predicate ranges.
@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- TPC-H Q14 shape (promo effect): conditional revenue share over a
# month of shipments. part broadcasts (dim), lineitem's date range
# pushes down, and the percentage is one double division of two exact
# decimal sums — portable to the last bit.
@query(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                   THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END
               AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) * 100.0
           / CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
               AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS promo_pct,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def tpch_q14_promo_effect(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    part = table(spark, sf_dir, "part")
    # part scales 200k×SF — no forced broadcast; AQE picks per SF
    j = li.join(part, li.l_partkey == part.p_partkey)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return j.agg(
        (
            F.sum(promo.cast("decimal(28,10)")).cast("double")
            * F.lit(100.0)
            / F.sum(rev.cast("decimal(28,10)")).cast("double")
        ).alias("promo_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- exact distributed second moments: Pearson correlation of price vs
# quantity per return flag, computed from five exact decimal sums
# (Σx, Σy, Σxy, Σx², Σy²) combined in one fixed double-arithmetic
# formula — order-independent and bit-identical across engines, unlike
# built-in corr()/stddev() whose float accumulation order varies with
# partitioning. The moments are map-side-combinable, so the whole
# statistic costs one aggregate pass at any scale. sqrt is IEEE
# correctly-rounded in both engines.
@query(
    "lineitem_price_qty_corr",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sx,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sy,
               CAST(CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sxy,
               CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS sxx,
               CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS syy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_items,
           (n * sxy - sx * sy)
               / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS price_qty_corr
    FROM m
    """,
)
def lineitem_price_qty_corr(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")

    def dsum_expr(c, alias):
        return F.sum(c.cast("decimal(28,10)")).cast("double").alias(alias)

    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum_expr(x, "sx"),
        dsum_expr(y, "sy"),
        dsum_expr(x * y, "sxy"),
        dsum_expr(x * x, "sxx"),
        dsum_expr(y * y, "syy"),
    )
    n, sx, sy, sxy, sxx, syy = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return m.select(
        "l_returnflag",
        n.cast("bigint").alias("n_items"),
        corr.alias("price_qty_corr"),
    )


# --- MERGE INTO parity (SCD1 upsert) on a partitioned parquet store:
# the update batch UPDATES matched keys whole-row (including a
# partition MOVE for some), INSERTS unmatched keys, and the store
# rewrite touches only the affected partition directories
# (`sources/merge.py:merge_upsert` — dynamic partition overwrite; the
# untouched-partition-files-unchanged guarantee is unit-tested in
# tests/test_merge.py, the value guarantee is this oracle). The oracle
# recomputes the expected post-merge state from `orders` directly, so
# the hash compare proves write → merge → read-back lossless: updates
# won, moved rows left their old partition, inserts landed, unmatched
# rows are byte-identical.
@query(
    "merge_upsert_roundtrip",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               o_orderpriority
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 100.0e0 AS o_totalprice,
               CASE WHEN o_orderkey % 14 = 3 THEN '1-URGENT'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM base WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey + 10000000, 'N', 42.0e0, '5-LOW'
        FROM base WHERE o_orderkey % 97 = 0
    ),
    merged AS (
        SELECT * FROM upd
        UNION ALL
        SELECT b.* FROM base b
        LEFT JOIN (SELECT DISTINCT o_orderkey FROM upd) k
            ON b.o_orderkey = k.o_orderkey
        WHERE k.o_orderkey IS NULL
    )
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           {sql_dsum("o_totalprice", "total_price")}
    FROM merged
    GROUP BY o_orderpriority
    """,
)
def merge_upsert_roundtrip(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.merge import merge_upsert
    from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderpriority",
    )
    store = tempfile.mkdtemp(prefix="merge_store_")
    write_parquet(base, store, partition_by=("o_orderpriority",))
    updates = (
        base.where(F.col("o_orderkey") % 7 == 3)
        .select(
            "o_orderkey",
            "o_orderstatus",
            (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
            F.when(F.col("o_orderkey") % 14 == 3, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
        .unionByName(
            base.where(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(42.0).alias("o_totalprice"),
                F.lit("5-LOW").alias("o_orderpriority"),
            )
        )
    )
    merge_upsert(spark, store, updates, ("o_orderkey",), "o_orderpriority")
    back = spark.read.parquet(store)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


# --- time travel over the WAP publish store: two published snapshots
# (a day-1 partial load, then the day-2 full load), read back as
# CURRENT and `VERSION AS OF -1` (`sources/publish.py:read_published`
# relative-offset form — Delta time travel over the retention window).
# The oracle recomputes both days' states from `orders`, so the hash
# compare proves the previous snapshot survives the next publish
# BYTE-EXACT — the audit/rollback/reproducible-training-run property
# the retention window exists for.
@query(
    "publish_time_travel",
    oracle=f"""
    WITH day1 AS (
        SELECT o_orderstatus, CAST(o_totalprice AS DOUBLE) AS p
        FROM orders WHERE o_orderkey % 3 != 0
    ),
    day2 AS (
        SELECT o_orderstatus, CAST(o_totalprice AS DOUBLE) AS p FROM orders
    )
    SELECT 'current' AS snapshot, o_orderstatus, COUNT(*) AS n_rows,
           {sql_dsum("p", "total_price")}
    FROM day2 GROUP BY o_orderstatus
    UNION ALL
    SELECT 'previous', o_orderstatus, COUNT(*),
           {sql_dsum("p", "total_price")}
    FROM day1 GROUP BY o_orderstatus
    """,
)
def publish_time_travel(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        publish_table,
        read_published,
    )

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    root = tempfile.mkdtemp(prefix="timetravel_")
    publish_table(orders.where(F.col("o_orderkey") % 3 != 0), root)
    publish_table(orders, root)

    def state(df, label):
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum(F.col("o_totalprice"), "total_price"),
        ).select(F.lit(label).alias("snapshot"), "*")

    return state(read_published(spark, root), "current").unionByName(
        state(read_published(spark, root, version=-1), "previous")
    )


# --- runtime bloom-filter join pruning (semi-join reduction): when
# NEITHER join side broadcasts — the 100 TB fact⋈filtered-fact regime —
# Spark can still prune the big side's shuffle ROW-WISE by building a
# bloom filter over the small side's join keys and injecting
# `might_contain(xxhash64(key))` into the big side's scan filter: rows
# that cannot match never enter the exchange. That is the runtime
# complement to DPP (`events_dpp_partitioned_join` prunes whole
# partitions; this prunes rows inside them) and the Spark twin of
# Trino/Snowflake runtime filters. The query runs on an ISOLATED
# `newSession` (same context, own conf) because the enabling confs —
# broadcast off to simulate the neither-side-broadcasts regime, the
# application-side size floor dropped to fire at test scale — must
# hold at EXECUTION time without leaking into the shared session.
# Plan pinned in tests/test_plans.py: the lineitem scan filter must
# carry might_contain.
@query(
    "lineitem_bloom_pruned_join",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n_items,
           {sql_dsum("l_extendedprice", "revenue")}
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY l_returnflag
    """,
)
def lineitem_bloom_pruned_join(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.workload.base import pin_session

    sub = spark.newSession()
    pin_session(sub)
    sub.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    sub.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
    )
    sub.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold",
        "0",
    )
    sub.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    li = table(sub, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice"
    )
    o = (
        table(sub, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice"), "revenue"),
        )
    )


# --- CDC apply (Debezium/DMS → lake): a change batch of I/U/D events
# with a monotone sequence lands on the partitioned store through
# `sources/merge.py:apply_cdc` — per-key keep-latest resolution (one
# window over the BATCH, never the store; seq ties break toward
# delete), then one touched-partitions-only MERGE pass with
# WHEN MATCHED DELETE semantics. The constructed batch exercises every
# resolution case at once: updates (some partition-moving), inserts,
# deletes, and keys carrying BOTH an update and a later delete (the
# delete must win). The oracle recomputes the expected post-apply
# state from `orders`, so the hash compare proves resolution order,
# delete-wins, and the rewrite are all value-exact.
@query(
    "cdc_apply_roundtrip",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               o_orderpriority
        FROM orders
    ),
    merged AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice + 100.0e0 AS o_totalprice,
               CASE WHEN o_orderkey % 14 = 3 THEN '1-URGENT'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM base WHERE o_orderkey % 7 = 3 AND o_orderkey % 10 != 1
        UNION ALL
        SELECT o_orderkey + 10000000, 'N', 42.0e0, '5-LOW'
        FROM base WHERE o_orderkey % 97 = 0
        UNION ALL
        SELECT * FROM base WHERE o_orderkey % 10 != 1 AND o_orderkey % 7 != 3
    )
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           {sql_dsum("o_totalprice", "total_price")}
    FROM merged
    GROUP BY o_orderpriority
    """,
)
def cdc_apply_roundtrip(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.merge import apply_cdc
    from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderpriority",
    )
    store = tempfile.mkdtemp(prefix="cdc_store_")
    write_parquet(base, store, partition_by=("o_orderpriority",))
    updates = base.where(F.col("o_orderkey") % 7 == 3).select(
        "o_orderkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 14 == 3, F.lit("1-URGENT"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    inserts = base.where(F.col("o_orderkey") % 97 == 0).select(
        (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(42.0).alias("o_totalprice"),
        F.lit("5-LOW").alias("o_orderpriority"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    # deletes arrive AFTER the updates (seq 2): for the keys in both
    # sets, delete must win
    deletes = base.where(F.col("o_orderkey") % 10 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    apply_cdc(
        spark,
        store,
        updates.unionByName(inserts).unionByName(deletes),
        ("o_orderkey",),
        "o_orderpriority",
    )
    back = spark.read.parquet(store)
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("o_totalprice"), "total_price"),
    )


# --- declarative DQ constraint suite (Deequ/Great-Expectations shape,
# `plans/dq.py:constraint_report`): completeness / satisfies /
# uniqueness constraints over orders, every non-distinct metric
# computed in ONE map-combinable aggregate over one scan (the
# uniqueness pass is separate BY DESIGN — mixing an exact DISTINCT
# into the shared aggregate plans an Expand that multiplies the scan,
# the measured 19× approx_distinct_summary lesson), unpivoted to one
# row per constraint. Extends §2.11's raising referential checks with
# the report-card form a 100 TB nightly pipeline actually runs.
@query(
    "dq_constraint_report",
    oracle="""
    WITH m AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(COUNT(o_custkey) AS DOUBLE) AS c_cust,
               CAST(COUNT(CASE WHEN o_totalprice > 0.0e0
                                AND o_totalprice < 600000.0e0 THEN 1 END)
                    AS DOUBLE) AS c_price,
               CAST(COUNT(CASE WHEN o_orderpriority
                    SIMILAR TO '[1-5]-[A-Z ]+' THEN 1 END) AS DOUBLE) AS c_prio,
               CAST(COUNT(DISTINCT o_orderkey) AS DOUBLE) AS c_uniq
        FROM orders
    )
    SELECT * FROM (
        SELECT 'custkey_complete' AS constraint, c_cust / n AS metric,
               c_cust / n >= 1.0e0 AS passed FROM m
        UNION ALL
        SELECT 'price_in_range', c_price / n, c_price / n >= 0.99e0 FROM m
        UNION ALL
        SELECT 'priority_pattern', c_prio / n, c_prio / n >= 1.0e0 FROM m
        UNION ALL
        SELECT 'orderkey_unique', c_uniq / n, c_uniq / n >= 1.0e0 FROM m
    )
    """,
)
def dq_constraint_report(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.plans.dq import constraint_report

    orders = table(spark, sf_dir, "orders")
    return constraint_report(
        orders,
        [
            ("custkey_complete", "completeness", F.col("o_custkey"), 1.0),
            (
                "price_in_range",
                "satisfies",
                (F.col("o_totalprice") > 0.0) & (F.col("o_totalprice") < 600000.0),
                0.99,
            ),
            (
                "priority_pattern",
                "satisfies",
                F.col("o_orderpriority").rlike("^[1-5]-[A-Z ]+$"),
                1.0,
            ),
            ("orderkey_unique", "uniqueness", F.col("o_orderkey"), 1.0),
        ],
    )


# --- MERGE's SCD TYPE-2 pattern (close-and-insert versioning): the
# dimension-history op every warehouse runs — Delta documents it as
# the flagship MERGE recipe; here it is delivered on plain partitioned
# parquet (`sources/merge.py:scd2_apply`) with the same
# touched-partitions-only rewrite bound as the SCD1 upsert. The
# roundtrip seeds a customer-segment dim (one 1992 version per
# customer), applies a MULTI-version change batch (each customer's
# order dates/priorities — several changes per key chain into
# consecutive versions in ONE apply), reads the store back and
# aggregates the full interval table; the oracle derives the expected
# history directly with a lead() chain, so the hash compare proves
# close/insert/chain semantics, interval endpoints, and current-flag
# placement all at once. (events_scd2_intervals DERIVES intervals from
# an event log; this is the other half — MAINTAINING a versioned store
# under change batches.)
@query(
    "scd2_merge_roundtrip",
    oracle="""
    WITH chg AS (
        SELECT o_custkey AS k, o_orderdate AS ts, MAX(o_orderpriority) AS attr
        FROM orders WHERE o_orderkey % 11 = 0 GROUP BY o_custkey, o_orderdate
    ),
    allv AS (
        SELECT c_custkey AS k, c_mktsegment AS attr,
               DATE '1992-01-01' AS vf, 0 AS src
        FROM customer
        UNION ALL
        SELECT k, attr, ts AS vf, 1 AS src FROM chg
    ),
    v AS (
        SELECT k, attr, vf,
               lead(vf) OVER (PARTITION BY k ORDER BY vf, src) AS vt
        FROM allv
    )
    SELECT attr, CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(COUNT(*) FILTER (vt IS NULL) AS BIGINT) AS n_current,
           CAST(SUM(k) AS BIGINT) AS key_sum,
           CAST(SUM(date_diff('day', DATE '1970-01-01', vf)) AS BIGINT)
               AS from_days_sum,
           CAST(SUM(COALESCE(date_diff('day', DATE '1970-01-01', vt), -1))
               AS BIGINT) AS to_days_sum
    FROM v GROUP BY attr
    """,
)
def scd2_merge_roundtrip(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.merge import scd2_apply
    from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet

    cust = table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("attr"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.year(F.to_date(F.lit("1992-01-01"))).alias("valid_yr"),
    )
    store = tempfile.mkdtemp(prefix="scd2_store_")
    write_parquet(base, store, partition_by=("valid_yr",))
    orders = table(spark, sf_dir, "orders")
    changes = (
        orders.where(F.col("o_orderkey") % 11 == 0)
        .groupBy(
            F.col("o_custkey").alias("k"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.max("o_orderpriority").alias("attr"))
    )
    scd2_apply(spark, store, changes, ("k",), "ts")
    final = spark.read.parquet(store)
    epoch = F.to_date(F.lit("1970-01-01"))
    return final.groupBy("attr").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
        F.count(F.when(F.col("is_current"), 1)).cast("bigint").alias("n_current"),
        F.sum("k").cast("bigint").alias("key_sum"),
        F.sum(F.datediff(F.col("valid_from"), epoch)).cast("bigint").alias("from_days_sum"),
        F.sum(
            F.coalesce(F.datediff(F.col("valid_to"), epoch), F.lit(-1))
        ).cast("bigint").alias("to_days_sum"),
    )


# --- SCD2 store INVARIANTS report (r13, the Deequ-shape DQ pass for
# the versioned-store tier): after a real multi-version apply, assert
# the three structural invariants every SCD2 consumer assumes —
# exactly one current row per key, no negative intervals, and chain
# continuity (each closed version's valid_to equals the key's next
# valid_from). The Spark side computes violation counts from the
# STORE the apply actually wrote; the oracle recomputes them from its
# independently-derived history — so a store that silently violated
# an invariant (the class the r13 review found twice: NULL-logic row
# drops, late-data negative intervals) fails the hash compare here
# even if downstream aggregates happen to agree.
@query(
    "scd2_store_invariants",
    oracle="""
    WITH chg AS (
        SELECT o_custkey AS k, o_orderdate AS ts, MAX(o_orderpriority) AS attr
        FROM orders WHERE o_orderkey % 11 = 0 GROUP BY o_custkey, o_orderdate
    ),
    allv AS (
        SELECT c_custkey AS k, c_mktsegment AS attr,
               DATE '1992-01-01' AS vf, 0 AS src
        FROM customer
        UNION ALL
        SELECT k, attr, ts AS vf, 1 AS src FROM chg
    ),
    v AS (
        SELECT k, vf,
               lead(vf) OVER (PARTITION BY k ORDER BY vf, src) AS vt
        FROM allv
    ),
    chk AS (
        SELECT k, vf, vt,
               lead(vf) OVER (PARTITION BY k
                              ORDER BY vf, vt ASC NULLS LAST) AS next_vf
        FROM v
    ),
    cur AS (SELECT k, COUNT(*) FILTER (vt IS NULL) AS n_cur
            FROM v GROUP BY k)
    SELECT CAST((SELECT COUNT(*) FROM cur) AS BIGINT) AS n_keys,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_versions,
           CAST((SELECT COUNT(*) FROM cur WHERE n_cur != 1) AS BIGINT)
               AS multi_current_keys,
           CAST((SELECT COUNT(*) FROM chk WHERE vt < vf) AS BIGINT)
               AS negative_intervals,
           CAST((SELECT COUNT(*) FROM chk
                 WHERE vt IS NOT NULL AND vt != next_vf) AS BIGINT)
               AS chain_gaps
    """,
)
def scd2_store_invariants(spark, sf_dir):
    import tempfile

    from pyspark.sql import Window

    from udacity_dend_capstone_immigration_spark.sources.merge import scd2_apply
    from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet

    cust = table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("attr"),
        F.to_date(F.lit("1992-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
        F.year(F.to_date(F.lit("1992-01-01"))).alias("valid_yr"),
    )
    store = tempfile.mkdtemp(prefix="scd2_inv_store_")
    write_parquet(base, store, partition_by=("valid_yr",))
    orders = table(spark, sf_dir, "orders")
    changes = (
        orders.where(F.col("o_orderkey") % 11 == 0)
        .groupBy(F.col("o_custkey").alias("k"), F.col("o_orderdate").alias("ts"))
        .agg(F.max("o_orderpriority").alias("attr"))
    )
    scd2_apply(spark, store, changes, ("k",), "ts")
    st = spark.read.parquet(store)
    # tiebreak matters: a zero-length closed version shares valid_from
    # with its successor — order (valid_from, valid_to NULLS LAST) puts
    # the closed row first deterministically in BOTH engines
    w = Window.partitionBy("k").orderBy(
        F.col("valid_from"), F.col("valid_to").asc_nulls_last()
    )
    chk = st.select(
        "k",
        "valid_from",
        "valid_to",
        "is_current",
        F.lead("valid_from").over(w).alias("next_vf"),
    )
    cur = st.groupBy("k").agg(
        F.count(F.when(F.col("is_current"), 1)).alias("n_cur")
    )
    return (
        cur.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.sum(F.when(F.col("n_cur") != 1, 1).otherwise(0))
            .cast("bigint")
            .alias("multi_current_keys"),
        )
        .crossJoin(
            chk.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_versions"),
                F.sum(
                    F.when(F.col("valid_to") < F.col("valid_from"), 1).otherwise(0)
                )
                .cast("bigint")
                .alias("negative_intervals"),
                F.sum(
                    F.when(
                        F.col("valid_to").isNotNull()
                        & (F.col("valid_to") != F.col("next_vf")),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias("chain_gaps"),
            )
        )
        .select(
            "n_keys",
            "n_versions",
            "multi_current_keys",
            "negative_intervals",
            "chain_gaps",
        )
    )


# --- snapshot version diff (change-data-feed shape): classify every
# row that changed between the previous and current published versions
# of the WAP store as insert / update / delete, with per-class value
# checksums. Delta's CDF / Iceberg's changelog scan done over the
# retention window: both snapshots come back off the STORE (never the
# in-memory frames — the diff proves what readers would see), full-outer
# joined on the key. Neither side broadcasts — both scale with SF — so
# the plan is the key-partitioned SMJ a 100 TB snapshot diff wants (at
# that scale both snapshots bucket by the key and the exchange
# disappears entirely; unchanged rows die in the join's own filter, so
# nothing downstream carries them). The oracle recomputes both days'
# states from `orders`, proving the store roundtrip AND the
# classification (insert = key absent before, delete = absent after,
# update = any column IS DISTINCT FROM its predecessor) value-exact.
@query(
    "publish_version_diff",
    oracle=f"""
    WITH prev AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(o_totalprice AS DOUBLE) AS p, o_orderpriority
        FROM orders
    ),
    cur AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 3 THEN p + 100.0e0 ELSE p END AS p,
               CASE WHEN o_orderkey % 14 = 3 THEN '1-URGENT'
                    ELSE o_orderpriority END AS o_orderpriority
        FROM prev WHERE o_orderkey % 11 != 4
        UNION ALL
        SELECT o_orderkey + 10000000, 'N', 42.0e0, '5-LOW'
        FROM prev WHERE o_orderkey % 97 = 0
    ),
    diff AS (
        SELECT COALESCE(n.o_orderstatus, o.o_orderstatus) AS o_orderstatus,
               CASE WHEN o.o_orderkey IS NULL THEN 'insert'
                    WHEN n.o_orderkey IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               o.p AS old_p, n.p AS new_p
        FROM prev o FULL OUTER JOIN cur n ON o.o_orderkey = n.o_orderkey
        WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR n.p IS DISTINCT FROM o.p
           OR n.o_orderstatus IS DISTINCT FROM o.o_orderstatus
           OR n.o_orderpriority IS DISTINCT FROM o.o_orderpriority
    )
    SELECT change_type, o_orderstatus, COUNT(*) AS n_rows,
           {sql_dsum("old_p", "old_total")}, {sql_dsum("new_p", "new_total")}
    FROM diff GROUP BY change_type, o_orderstatus
    """,
)
def publish_version_diff(spark, sf_dir):
    import tempfile

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        publish_table,
        read_published,
    )

    base = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderpriority",
    )
    day2 = (
        base.where(F.col("o_orderkey") % 11 != 4)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 7 == 3, F.col("o_totalprice") + F.lit(100.0)
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            F.when(F.col("o_orderkey") % 14 == 3, F.lit("1-URGENT"))
            .otherwise(F.col("o_orderpriority"))
            .alias("o_orderpriority"),
        )
        .unionByName(
            base.where(F.col("o_orderkey") % 97 == 0).select(
                (F.col("o_orderkey") + F.lit(10000000)).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(42.0).alias("o_totalprice"),
                F.lit("5-LOW").alias("o_orderpriority"),
            )
        )
    )
    root = tempfile.mkdtemp(prefix="versiondiff_")
    publish_table(base, root)
    publish_table(day2, root)

    prev = read_published(spark, root, version=-1).alias("o")
    cur = read_published(spark, root).alias("n")
    op, np_ = F.col("o.o_totalprice"), F.col("n.o_totalprice")
    changed = (
        ~np_.eqNullSafe(op)
        | ~F.col("n.o_orderstatus").eqNullSafe(F.col("o.o_orderstatus"))
        | ~F.col("n.o_orderpriority").eqNullSafe(F.col("o.o_orderpriority"))
    )
    diff = (
        prev.join(cur, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full_outer")
        .where(
            F.col("o.o_orderkey").isNull() | F.col("n.o_orderkey").isNull() | changed
        )
        .select(
            F.coalesce(F.col("n.o_orderstatus"), F.col("o.o_orderstatus")).alias(
                "o_orderstatus"
            ),
            F.when(F.col("o.o_orderkey").isNull(), F.lit("insert"))
            .when(F.col("n.o_orderkey").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            op.alias("old_p"),
            np_.alias("new_p"),
        )
    )
    return diff.groupBy("change_type", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("old_p"), "old_total"),
        dsum(F.col("new_p"), "new_total"),
    )
