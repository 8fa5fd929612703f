"""Event-time window + JSON queries over ``events`` (batch form of the
streaming operators; SURVEY.md §7.1 step 8).

These are the batch twins of the Structured Streaming wrappers in
``streaming/`` — identical window semantics (epoch-aligned tumbling /
sliding windows, gap-based sessions), minus watermarks which only matter
for unbounded input.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.windows import sessionize, sliding_window_agg, tumbling_window_agg
from udacity_dend_capstone_immigration_spark.workload.base import davg, dsum, query, sql_davg, sql_dsum, table


# --- tumbling 1-hour windows per event type (streaming groupBy(window)
# batch twin). One shuffle on (hour, type), map-side partials.
@query(
    "events_hourly_by_type",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS event_cnt,
           {sql_dsum("value", "total_value")}
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def events_hourly_by_type(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("event_cnt"), dsum(F.col("value"), "total_value"))


# --- sliding windows (2h long, 1h slide): each event lands in 2 windows.
@query(
    "events_sliding_2h",
    oracle="""
    WITH expanded AS (
        SELECT date_trunc('hour', ts) AS window_start, value FROM events
        UNION ALL
        SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, value FROM events
    )
    SELECT window_start, window_start + INTERVAL 2 HOUR AS window_end,
           COUNT(*) AS event_cnt
    FROM expanded
    GROUP BY window_start
    """,
)
def events_sliding_2h(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    out = sliding_window_agg(
        ev, "ts", "2 hours", "1 hour", [], [F.count(F.lit(1)).alias("event_cnt")]
    )
    return out.select("window_start", "window_end", "event_cnt")


# --- JSON extraction from the props column (semi-structured path).
@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*) AS event_cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS total_k,
           MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.sum(k).alias("total_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# --- malformed-record audit: PERMISSIVE from_json with a corrupt-record
# column — the quarantine pattern a production ingest runs so one bad
# producer can't fail the pipeline OR silently vanish. Corrupt rows are
# constructed BY DESIGN (every event_id % 10 == 0 props gets a leading
# byte that breaks the JSON — trailing garbage would NOT: Spark's
# parser accepts a complete value with trailing bytes, measured), so
# the oracle knows exactly which rows quarantine without parsing them.
@query(
    "events_json_corrupt_audit",
    oracle="""
    SELECT CAST(COUNT(*) FILTER (WHERE event_id % 10 != 0 AND props IS NOT NULL) AS BIGINT) AS n_valid,
           CAST(COUNT(*) FILTER (WHERE event_id % 10 = 0 OR props IS NULL) AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN event_id % 10 != 0 AND props IS NOT NULL
                    THEN CAST(json_extract_string(props, '$.k') AS INT) END)
                AS BIGINT) AS sum_k_valid
    FROM events
    """,
)
def events_json_corrupt_audit(spark, sf_dir):
    """One pass: parse-or-quarantine via columnNameOfCorruptRecord
    (valid rows land typed, corrupt rows keep their raw string), then a
    single aggregate counts both classes and sums k over the valid
    side only — proving corrupt rows are excluded from metrics, not
    nulled into them. A NULL payload parses to a NULL struct (no
    _corrupt_record to inspect), so missing-payload rows are classified
    corrupt too — otherwise a NULL props on a %10==0 row would count
    valid here while the construction-based oracle counts it corrupt
    (r10 ADVICE)."""
    ev = table(spark, sf_dir, "events")
    corrupted = F.when(
        F.col("event_id") % 10 == 0, F.concat(F.lit("x"), F.col("props"))
    ).otherwise(F.col("props"))
    parsed = ev.select(
        F.from_json(
            corrupted,
            "k INT, _corrupt_record STRING",
            {"columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("p")
    )
    bad = F.col("p._corrupt_record").isNotNull() | F.col("p").isNull()
    return parsed.agg(
        F.count(F.when(~bad, 1)).cast("bigint").alias("n_valid"),
        F.count(F.when(bad, 1)).cast("bigint").alias("n_corrupt"),
        F.sum(F.when(~bad, F.col("p.k"))).cast("bigint").alias("sum_k_valid"),
    )


# --- gap-based sessionization (30-min inactivity gap per user), batch
# twin of F.session_window; per-session rollup.
@query(
    "events_sessionize",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_n
        FROM ordered
    )
    SELECT CAST(user_id AS VARCHAR) || '-' || CAST(sess_n AS VARCHAR) AS session_id,
           user_id, COUNT(*) AS event_cnt,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sessions
    GROUP BY user_id, sess_n
    """,
)
def events_sessionize(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, "ts", "user_id", gap_minutes=30)
    return sess.groupBy("session_id", "user_id").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# --- pivot: per-day event-type counts as columns (reshaping operator the
# reference lacked; conditional-sum equivalent in the oracle).
@query(
    "events_daily_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
)
def events_daily_pivot(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    types = ["click", "view", "signup", "purchase", "error"]
    out = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", types)
        .count()
    )
    # pivot leaves null for absent combos; the oracle's FILTER yields 0
    return out.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


# --- per-user running aggregate (cumulative window frame).
@query(
    "events_user_running_total",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE) AS running_value
    FROM events
    """,
)
def events_user_running_total(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(28,10)")).over(w).cast("double").alias("running_value"),
    )


# --- PII scrubbing over the raw props payload: per-row pattern counts
# + the redacted string. Pure map work (chained regexp_replace, one
# codegen stage, zero shuffle) — the shape that scrubs 100 TB at scan
# speed. Patterns are RE2-safe and shared verbatim with the oracle via
# functions.text.PII_PATTERNS.
from udacity_dend_capstone_immigration_spark.functions.text import PII_PATTERNS  # noqa: E402
from udacity_dend_capstone_immigration_spark.functions.text import pii_counts, redact_pii  # noqa: E402


def _sql_redacted() -> str:
    out = "lower(props)"
    for pat, token in PII_PATTERNS.values():
        out = f"regexp_replace({out}, '{pat}', '{token}', 'g')"
    return out


_SQL_PII_COUNTS = ", ".join(
    f"CAST(len(regexp_extract_all(lower(props), '{pat}')) AS INT) AS n_{name}"
    for name, (pat, _) in PII_PATTERNS.items()
)


@query(
    "events_props_redaction",
    oracle=f"""
    SELECT event_id, {_SQL_PII_COUNTS},
           {_sql_redacted()} AS redacted_props
    FROM events
    """,
)
def events_props_redaction(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        *pii_counts("props").values(),
        redact_pii("props").alias("redacted_props"),
    )


# --- CEP-style consecutive-pattern detection: strictly consecutive
# (view -> click -> purchase) triples in each user's event sequence —
# the MATCH_RECOGNIZE shape expressed as two lags over one user_id
# window sort (a third window would reuse the same exchange+sort; lag
# offsets 1 and 2 share it outright). Output is per-user match counts.
@query(
    "events_cep_triples",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER w AS prev1,
               lag(event_type, 2) OVER w AS prev2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS triple_cnt
    FROM seq
    WHERE prev2 = 'view' AND prev1 = 'click' AND event_type = 'purchase'
    GROUP BY user_id
    """,
)
def events_cep_triples(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    )
    return (
        seq.where(
            (F.col("prev2") == "view")
            & (F.col("prev1") == "click")
            & (F.col("event_type") == "purchase")
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("triple_cnt"))
    )


# --- session bounce-rate rollup: sessions built by the 30-minute-gap
# operator, classified single-event (bounce) vs multi-event, rolled up
# per session-start day. Builds on the sessionize island pass (one
# user_id exchange) plus one day rollup — session analytics at any
# scale is exactly these two exchanges.
@query(
    "events_session_bounce_rate",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_n
        FROM ordered
    ),
    per_session AS (
        SELECT user_id, sess_n, COUNT(*) AS event_cnt,
               CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS day
        FROM sessions GROUP BY user_id, sess_n
    )
    SELECT day, COUNT(*) AS sessions,
           COUNT(*) FILTER (event_cnt = 1) AS bounces,
           CAST(COUNT(*) FILTER (event_cnt = 1) AS DOUBLE)
               / COUNT(*) AS bounce_rate
    FROM per_session GROUP BY day
    """,
)
def events_session_bounce_rate(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.operators.windows import sessionize

    ev = table(spark, sf_dir, "events")
    sess = sessionize(ev, "ts", "user_id", gap_minutes=30)
    per_session = sess.groupBy("session_id").agg(
        F.count(F.lit(1)).alias("event_cnt"),
        F.date_trunc("day", F.min("ts")).alias("day"),
    )
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).alias("sessions"),
        F.count(F.when(F.col("event_cnt") == 1, 1)).alias("bounces"),
        (
            F.count(F.when(F.col("event_cnt") == 1, 1)).cast("double")
            / F.count(F.lit(1))
        ).alias("bounce_rate"),
    )


# --- native session_window() in batch: Spark's built-in gap-session
# operator, oracle'd against the same islands SQL as events_sessionize
# — proving the built-in and the explicit window-island construction
# agree row-for-row. The built-in plans a single SessionWindow node on
# one user_id exchange (no row_number pass), the preferred form when
# you don't need the session_id string.
@query(
    "events_native_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_n
        FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS event_cnt,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, sess_n
    """,
)
def events_native_session_window(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_cnt",
            "total_value",
        )
    )


# --- Spark 4 VariantType JSON path: parse the props payload into a
# variant (the binary semi-structured type supplanting string-JSON
# round-trips), extract a typed field, and aggregate on it. Variant
# parse+extract stays JVM-side and shreds once instead of re-parsing
# the JSON per expression; output columns are atomic (the variant never
# leaves the query). Oracle uses DuckDB's JSON extraction — same typed
# semantics.
@query(
    "events_props_variant",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INT) // 10 AS k_decile,
           COUNT(*) AS event_cnt,
           CAST(MIN(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_min,
           CAST(MAX(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS k_max
    FROM events
    GROUP BY CAST(json_extract(props, '$.k') AS INT) // 10
    """,
)
def events_props_variant(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select(k.alias("k"))
        .groupBy(F.floor(F.col("k") / 10).cast("int").alias("k_decile"))
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


# --- salted dimension join: the deterministic skew guardrail as a
# driver-checked query (the operator had only unit coverage). AQE's
# skew-join splits oversized sort-merge partitions at runtime, but a
# KNOWN hot key in a statically-planned or hash-partitioned join still
# serializes; `salted_join` pre-spreads the large side by a full-row
# xxhash64 salt and explodes the small side salt_buckets× — results
# provably equal the plain join (the oracle IS the plain join). The
# events extrapolation's hot-user corpus is the motivating shape; the
# base testdata is uniform, so the query here proves equivalence and
# the 10×/100× hot-key table in BASELINE.md proves the need.
@query(
    "events_salted_dim_join",
    oracle=f"""
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS event_cnt,
           {sql_dsum("e.value", "total_value")}
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def events_salted_dim_join(spark, sf_dir):
    from udacity_dend_capstone_immigration_spark.operators.skew import salted_join

    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # merge hint: salting only matters for SHUFFLE joins (a broadcast
    # join never shuffles the large side, so it has no skew problem —
    # and customer is SF-scaling, estimate-blind after the salt
    # explode, so the static planner would happily broadcast it at any
    # corpus size). Forcing SMJ exercises the shape the operator
    # exists for.
    dim = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
        .hint("merge")
    )
    j = salted_join(ev, dim, "user_id", salt_buckets=8, row_id_col="event_id")
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("event_cnt"),
        dsum(F.col("value"), "total_value"),
    )


# --- DYNAMIC-gap session windows (native session_window with a
# per-event gap Column — Spark 3.2+): purchases hold a session open
# for 1 hour, everything else 30 minutes, the "checkout keeps the
# visit alive" policy real funnels use. Semantics differ from fixed
# gap in one load-bearing way the oracle states exactly: the session
# end is the RUNNING MAX of (ts + its own gap) — a long-gap event
# extends the session past later short-gap events' horizons — so the
# break predicate is ts >= max-over-prior-events(ts + gap), not a
# lag-difference test. One user-keyed exchange either way.
@query(
    "events_dynamic_gap_sessions",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'purchase' THEN INTERVAL 1 HOUR
                    ELSE INTERVAL 30 MINUTE END AS gap
        FROM events
    ),
    marked AS (
        SELECT user_id, ts, event_id, value, gap,
               CASE WHEN MAX(ts + gap) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                     OR ts >= MAX(ts + gap) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS brk
        FROM g
    ),
    sessions AS (
        SELECT user_id, ts, value, gap,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sess_n
        FROM marked
    )
    SELECT user_id, MIN(ts) AS session_start, MAX(ts + gap) AS session_end,
           COUNT(*) AS event_cnt,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)
               AS total_value
    FROM sessions
    GROUP BY user_id, sess_n
    """,
)
def events_dynamic_gap_sessions(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", "1 hour").otherwise(
        "30 minutes"
    )
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("event_cnt"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_cnt",
            "total_value",
        )
    )


# --- week-over-week growth report: daily totals with the same-weekday
# prior-week comparison (the BI staple). The heavy input collapses to
# ~30 day rows in ONE map-combinable aggregate; the lag(7) window then
# runs over day rows only — at any event volume the window sees ≤
# span-in-days rows, so there is no per-key scale hazard to salt or
# rewrite. Growth is one IEEE division of two portable decimal-summed
# doubles; days without a prior week report NULL growth (stated by
# the oracle, so null-vs-zero semantics are hash-checked too).
@query(
    "events_wow_growth",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
               CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR)
                    AS DOUBLE) AS total_value
        FROM events GROUP BY CAST(ts AS DATE)
    )
    SELECT day, n_events, total_value,
           lag(total_value, 7) OVER (ORDER BY day) AS prior_week_value,
           total_value / lag(total_value, 7) OVER (ORDER BY day) - 1.0e0
               AS wow_growth
    FROM daily
    """,
)
def events_wow_growth(spark, sf_dir):
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value"), "total_value"),
    )
    w = Window.orderBy("day")
    prior = F.lag("total_value", 7).over(w)
    return daily.select(
        "day",
        "n_events",
        "total_value",
        prior.alias("prior_week_value"),
        (F.col("total_value") / prior - F.lit(1.0)).alias("wow_growth"),
    )
