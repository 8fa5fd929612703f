"""Analytic-window and reshape queries: lag/lead, ntile, unpivot,
explode.

The reference has no window functions (SURVEY.md §2.5 — its top-k uses
ORDER BY/LIMIT subqueries), but these are the idiomatic generalizations
a user of the reference reaches for next: event-gap analysis (lag),
cohort quartiles (ntile), metric melting (unpivot), and term extraction
(explode). All are single-shuffle shapes: one Exchange on the window
partition key / group key, map-side partials where an aggregate follows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.workload.base import (
    davg,
    dsum,
    query,
    sql_davg,
    sql_dsum,
    table,
)


# --- lag(): per-user inter-event gaps, aggregated per event type.
# One shuffle on user_id for the window, one on event_type for the agg.
# At 100 TB the window partitions by user (high-cardinality, balanced)
# so state never concentrates; gap arithmetic is exact integer micros.
@query(
    "events_lag_gaps",
    oracle=f"""
    WITH seq AS (
        SELECT event_type,
               CAST(epoch_us(ts)
                    - lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                    AS DOUBLE) / 1e6 AS gap_sec
        FROM events
    )
    SELECT event_type, COUNT(*) AS event_cnt,
           COUNT(gap_sec) AS gap_cnt,
           {sql_davg("gap_sec", "avg_gap_sec")},
           CAST(MAX(gap_sec) AS DOUBLE) AS max_gap_sec
    FROM seq GROUP BY event_type
    """,
)
def events_lag_gaps(spark, sf_dir):
    """Time since the user's previous event (any type), summarized per
    event type. ``unix_micros`` keeps the subtraction in exact integer
    microseconds (portable), divided to seconds in double only per-row;
    (ts, event_id) ordering makes lag deterministic under ts ties."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        (
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).cast("double")
            / F.lit(1e6)
        ).alias("gap_sec"),
    )
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.count("gap_sec").alias("gap_cnt"),
        davg(F.col("gap_sec"), "avg_gap_sec"),
        F.max("gap_sec").alias("max_gap_sec"),
    )


# --- ntile(): customer spend quartiles. The ntile window is global
# (single ORDER BY all customers) — fine here because the input is the
# already-aggregated per-customer rollup (|customers| rows, not |orders|);
# at 1000 executors that pre-aggregation is the thing that keeps the
# single-partition sort from being the bottleneck.
@query(
    "customer_spend_quartiles",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey, {sql_dsum("o_totalprice", "total_spend")}
        FROM orders GROUP BY o_custkey
    ),
    tiled AS (
        SELECT total_spend,
               ntile(4) OVER (ORDER BY total_spend, o_custkey) AS quartile
        FROM spend
    )
    SELECT quartile, COUNT(*) AS customer_cnt,
           CAST(MIN(total_spend) AS DOUBLE) AS min_spend,
           CAST(MAX(total_spend) AS DOUBLE) AS max_spend,
           {sql_davg("total_spend", "avg_spend")}
    FROM tiled GROUP BY quartile
    """,
)
def customer_spend_quartiles(spark, sf_dir):
    """ntile(4) over per-customer lifetime spend, with (spend, custkey)
    tiebreak so bucket boundaries are engine-independent. Bucketing runs
    through ``operators.quantiles.equi_depth_buckets`` — a range-
    partitioned distributed rank with the identical ntile split, not the
    single-task ``Window.orderBy`` sort the r2 verdict flagged (plan
    gate: tests/test_plans.py asserts no Exchange SinglePartition)."""
    from udacity_dend_capstone_immigration_spark.operators.quantiles import equi_depth_buckets

    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dsum(F.col("o_totalprice"), "total_spend"))
    tiled = equi_depth_buckets(
        spend, ["total_spend", "o_custkey"], 4, bucket_col="quartile"
    ).select("total_spend", "quartile")
    return tiled.groupBy("quartile").agg(
        F.count(F.lit(1)).alias("customer_cnt"),
        F.min("total_spend").alias("min_spend"),
        F.max("total_spend").alias("max_spend"),
        davg(F.col("total_spend"), "avg_spend"),
    )


# --- unpivot/melt: wide per-priority metrics → long (metric, value)
# rows. Spark's DataFrame.unpivot is a zero-shuffle Expand node — each
# input row fans out to k metric rows map-side.
@query(
    "orders_metrics_unpivot",
    oracle=f"""
    WITH m AS (
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS DOUBLE) AS order_cnt,
               {sql_dsum("o_totalprice", "total_price")},
               {sql_davg("o_totalprice", "avg_price")}
        FROM orders GROUP BY o_orderpriority
    )
    SELECT priority, 'order_cnt' AS metric, order_cnt AS value FROM m
    UNION ALL
    SELECT priority, 'total_price' AS metric, total_price AS value FROM m
    UNION ALL
    SELECT priority, 'avg_price' AS metric, avg_price AS value FROM m
    """,
)
def orders_metrics_unpivot(spark, sf_dir):
    """Aggregate per priority, then melt the three metric columns into
    (priority, metric, value) rows — all metrics cast to double so the
    unpivoted value column has one type."""
    orders = table(spark, sf_dir, "orders")
    wide = orders.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).cast("double").alias("order_cnt"),
        dsum(F.col("o_totalprice"), "total_price"),
        davg(F.col("o_totalprice"), "avg_price"),
    )
    return wide.unpivot(
        ids=["priority"],
        values=["order_cnt", "total_price", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --- explode/lateral view: corpus term frequencies. split→explode is
# the Spark-native UNNEST; the heavy groupBy(term) shuffles only (term,
# partial-count) pairs thanks to map-side combine, so the wire cost is
# distinct-terms-per-partition, not total tokens — the property that
# keeps this viable over a 100 TB corpus.
@query(
    "doc_top_terms",
    oracle="""
    WITH terms AS (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS term
        FROM documents
    )
    SELECT term, COUNT(*) AS term_cnt
    FROM terms WHERE length(term) >= 4
    GROUP BY term ORDER BY term_cnt DESC, term LIMIT 20
    """,
)
def doc_top_terms(spark, sf_dir):
    """Top-20 alphabetic terms (length ≥ 4) across the corpus. The
    ``[^a-z]+`` splitter is RE2-safe and byte-identical between Java
    regex and DuckDB's RE2; (count DESC, term) tiebreak pins rank-20."""
    docs = table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term")
    ).where(F.length("term") >= 4)
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("term_cnt"))
        .orderBy(F.desc("term_cnt"), "term")
        .limit(20)
    )


# --- FULL OUTER join: per-nation customer vs supplier tallies on
# deliberately sparse filters so both null branches are exercised
# (reference covers left/inner/anti — SURVEY.md §2.3; semi is
# customers_with_orders_semi). Both sides pre-aggregate to nation
# cardinality before the join, so the full-outer (which Spark can never
# broadcast) sort-merges two dim-sized inputs — constant-cost at any
# event volume.
@query(
    "nation_balance_full_outer",
    oracle="""
    WITH c AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS cust_cnt
        FROM customer WHERE c_acctbal < -900 GROUP BY c_nationkey
    ),
    s AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS supp_cnt
        FROM supplier WHERE s_acctbal < -700 GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(cust_cnt, 0) AS cust_cnt,
           COALESCE(supp_cnt, 0) AS supp_cnt
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    """,
)
def nation_balance_full_outer(spark, sf_dir):
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    c = (
        customer.where(F.col("c_acctbal") < -900)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    s = (
        supplier.where(F.col("s_acctbal") < -700)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("supp_cnt"))
    )
    out = c.join(s, "nationkey", "full_outer")
    return out.select(
        "nationkey",
        F.coalesce("cust_cnt", F.lit(0)).alias("cust_cnt"),
        F.coalesce("supp_cnt", F.lit(0)).alias("supp_cnt"),
    )


# --- correlated scalar subqueries (orders above their own customer's
# average). Catalyst decorrelates both subqueries into aggregate+join —
# .explain shows no per-row subplan execution, so the shape scales as
# two hash aggregates plus one join on o_custkey. The avg comparison is
# cross-multiplied (price * count > sum) in exact decimals so the
# boundary rows are engine-independent (no float-average tie risk).
@query(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE CAST(o_totalprice AS DECIMAL(28,10))
          * (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
          > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(28,10)))
             FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
    """,
)
def orders_above_customer_avg(spark, sf_dir):
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_corr")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_corr o
        WHERE CAST(o_totalprice AS DECIMAL(28,10))
              * (SELECT COUNT(*) FROM orders_corr o2 WHERE o2.o_custkey = o.o_custkey)
              > (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(28,10)))
                 FROM orders_corr o3 WHERE o3.o_custkey = o.o_custkey)
        """
    )


# --- ranking-family windows: percent_rank / cume_dist / first_value /
# nth_value per order (the rest of §2.5's idiomatic set; lag and ntile
# are covered above). Explicit unbounded ROWS frame for the value
# functions so both engines read the whole partition; (price,
# linenumber) is a total order within each order so ranks are
# deterministic. percent_rank's (rank-1)/(n-1) division is the same
# double op in both engines.
@query(
    "lineitem_price_rank_stats",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           percent_rank() OVER w AS price_pr,
           cume_dist() OVER w AS price_cd,
           first_value(l_extendedprice) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS min_price,
           nth_value(l_extendedprice, 2) OVER
               (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice, l_linenumber)
    """,
)
def lineitem_price_rank_stats(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_extendedprice", "l_linenumber")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.percent_rank().over(w).alias("price_pr"),
        F.cume_dist().over(w).alias("price_cd"),
        F.first("l_extendedprice").over(wf).alias("min_price"),
        F.nth_value("l_extendedprice", 2).over(wf).alias("second_price"),
    )


# --- blocked fuzzy join: near-duplicate part names by edit distance.
# Entity-resolution shape: dedup to distinct names first (64 here, but
# the point is names << rows at any scale), block on a cheap predicate
# (length difference) to bound the candidate set, then run levenshtein
# only on survivors. At 100 TB the distinct-name table is dim-sized, so
# the self-join broadcasts; the expensive metric never touches raw rows.
@query(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM names a JOIN names b ON a.p_name < b.p_name
    WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
      AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_part_name_pairs(spark, sf_dir):
    part = table(spark, sf_dir, "part")
    # the broadcast side is the DISTINCT name vocabulary, which
    # saturates rather than scaling with SF (measured 62/64/64 distinct
    # at 1×/10×/100× data — the generator draws from a fixed pool), so
    # the broadcast payload is ~constant. For an unbounded name space
    # this band join is quadratic by definition — feed it bucketed
    # subsets (the dedup ladder) instead of the whole column.
    names = part.select("p_name").distinct()
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    pairs = a.join(
        F.broadcast(b),
        (F.col("name_a") < F.col("name_b"))
        & (F.abs(F.length("name_a") - F.length("name_b")) <= 2),
    )
    return pairs.withColumn(
        "edit_dist", F.levenshtein("name_a", "name_b")
    ).where(F.col("edit_dist") <= 3)


# --- cross join densification: the full region × order-priority grid
# with zero-filled counts (reporting-grid shape). The deliberate
# CartesianProduct is dims-only — 5 × 5 rows — while the fact-side
# counts pre-aggregate before the left join, so the nested-loop join
# Spark plans here never touches fact-table cardinality.
@query(
    "region_priority_grid",
    oracle="""
    WITH counts AS (
        SELECT r_name, o_orderpriority, COUNT(*) AS order_cnt
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, o_orderpriority
    ),
    grid AS (
        SELECT r_name, o_orderpriority
        FROM (SELECT DISTINCT r_name FROM region)
        CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    )
    SELECT g.r_name AS region, g.o_orderpriority AS priority,
           COALESCE(c.order_cnt, 0) AS order_cnt
    FROM grid g LEFT JOIN counts c
        ON g.r_name = c.r_name AND g.o_orderpriority = c.o_orderpriority
    """,
)
def region_priority_grid(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    counts = (
        orders.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    grid = (
        region.select("r_name")
        .distinct()
        .crossJoin(orders.select("o_orderpriority").distinct())
    )
    out = grid.join(counts, ["r_name", "o_orderpriority"], "left")
    return out.select(
        F.col("r_name").alias("region"),
        F.col("o_orderpriority").alias("priority"),
        F.coalesce("order_cnt", F.lit(0)).alias("order_cnt"),
    )


# --- deterministic array aggregation: per-order sorted quantity vector
# (the feature-assembly shape: rows → one array column per key).
# collect_list order is nondeterministic under parallel merge, so the
# engine-portable form is array_sort over the collected values — ties
# are equal values, so the sorted array is unique. One exchange on the
# group key; arrays are bounded by per-order line count (≤7 in TPC-H
# shape), never unbounded. The DRIVER-facing column is the array
# serialized to CSV (array outputs crash the driver canonicalizer —
# tests/test_registry.py); quantities are integral 1–50 so the int cast
# makes Spark/DuckDB string forms identical. concat_ws + cast are
# codegen'd (no lambda HOF).
@query(
    "order_quantity_vectors",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_quantity AS INT), ',' ORDER BY l_quantity) AS qtys_csv,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY l_orderkey
    """,
)
def order_quantity_vectors(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.concat_ws(
            ",",
            F.array_sort(F.collect_list(F.col("l_quantity").cast("int"))).cast(
                "array<string>"
            ),
        ).alias("qtys_csv"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- cohort retention: users grouped by first-seen week, distinct
# activity counted per week offset. Classic product-analytics rollup;
# all heavy lifting happens in two user-keyed aggregates that share one
# hash partitioning on user_id (min-week, then distinct user-weeks), so
# at 100 TB there is exactly one wide shuffle of (user, week) pairs plus
# a tiny cohort-size broadcast.
@query(
    "events_cohort_retention",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id
    ),
    sizes AS (
        SELECT cw, COUNT(*) AS cohort_users FROM cohort GROUP BY cw
    ),
    act AS (
        SELECT c.cw, CAST(date_diff('day', c.cw, uw.w) AS INT) // 7 AS week_offset,
               COUNT(*) AS active_users
        FROM uw JOIN cohort c ON uw.user_id = c.user_id
        GROUP BY c.cw, CAST(date_diff('day', c.cw, uw.w) AS INT) // 7
    )
    SELECT act.cw AS cohort_week, week_offset, active_users,
           cohort_users,
           CAST(active_users AS DOUBLE) / cohort_users AS retention_rate
    FROM act JOIN sizes ON act.cw = sizes.cw
    """,
)
def events_cohort_retention(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # the distinct (user, week) activity set feeds three consumers
    # (cohort min, sizes, activity join); a lazy localCheckpoint
    # materializes it once instead of re-scanning events per consumer
    # (same lineage-truncation pattern as the MinHash pipeline)
    uw = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cohort = uw.groupBy("user_id").agg(F.min("w").alias("cw"))
    sizes = cohort.groupBy("cw").agg(F.count(F.lit(1)).alias("cohort_users"))
    act = (
        # merge hint: cohort is O(users) — SF-scaling, and size-blind
        # behind the checkpoint (static planner would broadcast it at
        # any corpus size); sizes stays broadcast (one row per week)
        uw.join(cohort.hint("merge"), "user_id")
        .groupBy(
            "cw",
            F.floor(F.datediff(F.col("w"), F.col("cw")) / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return act.join(F.broadcast(sizes), "cw").select(
        F.col("cw").cast("date").alias("cohort_week"),
        "week_offset",
        "active_users",
        "cohort_users",
        (F.col("active_users").cast("double") / F.col("cohort_users")).alias(
            "retention_rate"
        ),
    )


# --- ordered funnel: view -> click (after the first view) -> purchase
# (after that click), counted per user then rolled into 3 stage rows.
# Each stage is a conditional-min aggregate keyed on user_id; Catalyst
# keeps all three on the same user_id partitioning, so the funnel costs
# one wide shuffle regardless of corpus size.
@query(
    "events_funnel_stages",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    ),
    stages AS (
        SELECT 1 AS stage_no, 'view' AS stage, COUNT(*) AS users FROM v
        UNION ALL
        SELECT 2, 'click_after_view', COUNT(*) FROM c
        UNION ALL
        SELECT 3, 'purchase_after_click', COUNT(*) FROM p
    )
    SELECT stage_no, stage, users,
           CAST(users AS DOUBLE)
               / MAX(users) OVER () AS conversion_from_start
    FROM stages
    """,
)
def events_funnel_stages(spark, sf_dir):
    """Single-pass shape: one filtered scan feeds a per-user pivot of
    first-view/click/purchase event lists, the stage chain is evaluated
    per user without re-scanning events, and the three stage rows come
    from ONE global aggregate stacked via explode. The naive
    union-of-three-subqueries form scanned events 12× with no exchange
    reuse — at 100 TB the difference is 11 full passes."""
    ev = table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    # per user: ordered (ts) arrays per stage type, from one shuffle
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t1"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "click", F.col("ts")))
        ).alias("clicks"),
        F.array_sort(
            F.collect_list(F.when(F.col("event_type") == "purchase", F.col("ts")))
        ).alias("purchases"),
    )
    # first click strictly after t1, first purchase strictly after t2 —
    # array filters over per-user event lists (bounded by a user's own
    # activity), no second scan or join
    t2 = F.array_min(F.filter("clicks", lambda x: x > F.col("t1")))
    per_user = per_user.withColumn("t2", F.when(F.col("t1").isNotNull(), t2))
    t3 = F.array_min(F.filter("purchases", lambda x: x > F.col("t2")))
    per_user = per_user.withColumn("t3", F.when(F.col("t2").isNotNull(), t3))
    one = per_user.agg(
        F.count("t1").alias("c1"),
        F.count("t2").alias("c2"),
        F.count("t3").alias("c3"),
    )
    stages = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("stage_no"),
                    F.lit("view").alias("stage"),
                    F.col("c1").alias("users"),
                ),
                F.struct(
                    F.lit(2).alias("stage_no"),
                    F.lit("click_after_view").alias("stage"),
                    F.col("c2").alias("users"),
                ),
                F.struct(
                    F.lit(3).alias("stage_no"),
                    F.lit("purchase_after_click").alias("stage"),
                    F.col("c3").alias("users"),
                ),
            )
        ).alias("s"),
        F.col("c1").alias("base"),
    )
    return stages.select(
        "s.stage_no",
        "s.stage",
        "s.users",
        (F.col("s.users").cast("double") / F.col("base")).alias("conversion_from_start"),
    )


# --- rolling 7-day active users (WAU): COUNT(DISTINCT) is not legal
# over window frames in either engine, so each (user, day) activity row
# is exploded to the 7 day-spine rows it covers and the rollup is a
# plain distinct-count per covering day — the standard dense-rollup
# shape. Cardinality into the final shuffle is |users| x |days| x 7
# (bounded by the spine, independent of raw event volume).
@query(
    "events_rolling_wau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    days AS (SELECT DISTINCT d FROM ud),
    cover AS (
        SELECT days.d AS day, ud.user_id
        FROM days JOIN ud
            ON ud.d <= days.d AND ud.d > days.d - INTERVAL 7 DAY
    )
    SELECT day, COUNT(DISTINCT user_id) AS wau
    FROM cover GROUP BY day
    """,
)
def events_rolling_wau(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    # distinct (user, day) feeds both the day spine and the covering
    # explode — checkpoint once, scan events once
    ud = (
        ev.select("user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # explode each activity day to the 7 spine days it contributes to,
    # then keep only days that actually exist in the data (the oracle's
    # days-join semantics)
    days = ud.select("d").distinct().withColumnRenamed("d", "day")
    covered = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d"), F.date_add(F.col("d"), 6), F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    return (
        covered.join(days, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


from udacity_dend_capstone_immigration_spark.workload.base import ORACLES  # noqa: E402


# --- entity resolution end-to-end (block → match → cluster →
# canonicalize): the named production workload MDM/catalog pipelines
# run, composed entirely from verified operators — the blocked
# levenshtein matcher (`fuzzy_part_name_pairs`: distinct-name
# vocabulary, length-block, metric only on survivors) feeds
# `connected_components` (min-LABEL propagation works unchanged on
# STRING ids — the canonical entity name is the lexicographic min of
# its variant cluster), then each entity reports its variant count and
# the raw-row mass it covers. Scale shape: matching and clustering run
# on the dim-sized name vocabulary (saturates at 64 names on this
# generator), only the final coverage join touches the fact table —
# one hash join on p_name. The oracle resolves the same closure with a
# recursive CTE (the dedup_clusters template).
@query(
    "entity_resolution_parts",
    oracle=f"""
    WITH RECURSIVE
    pairs AS ({ORACLES["fuzzy_part_name_pairs"]}),
    names AS (SELECT DISTINCT p_name FROM part),
    edges AS (
        SELECT name_a AS src, name_b AS dst FROM pairs
        UNION
        SELECT name_b AS src, name_a AS dst FROM pairs
    ),
    reach AS (
        SELECT p_name AS id, p_name AS lab FROM names
        UNION
        SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id
    ),
    ent AS (SELECT id AS p_name, MIN(lab) AS entity_name FROM reach GROUP BY id)
    SELECT ent.entity_name, COUNT(*) AS n_variants,
           CAST(SUM(c.n_parts) AS BIGINT) AS n_parts
    FROM ent
    JOIN (SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name) c
        ON ent.p_name = c.p_name
    GROUP BY ent.entity_name
    """,
)
def entity_resolution_parts(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.operators.dedup import (
        connected_components,
    )
    from udacity_dend_capstone_immigration_spark.workload.base import QUERIES

    part = table(spark, sf_dir, "part")
    names = part.select("p_name").distinct()
    pairs = QUERIES["fuzzy_part_name_pairs"](spark, sf_dir).select(
        F.col("name_a").alias("id_a"), F.col("name_b").alias("id_b")
    )
    ents = connected_components(pairs, names, id_col="p_name")
    counts = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    return (
        ents.join(counts, "p_name")
        .groupBy(F.col("cluster_id").alias("entity_name"))
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sum("n_parts").cast("bigint").alias("n_parts"),
        )
    )
