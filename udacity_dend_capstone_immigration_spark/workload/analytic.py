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
    tiebreak so bucket boundaries are engine-independent."""
    orders = table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(dsum(F.col("o_totalprice"), "total_spend"))
    tiled = spend.select(
        "total_spend",
        F.ntile(4).over(Window.orderBy("total_spend", "o_custkey")).alias("quartile"),
    )
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
