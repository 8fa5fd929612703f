"""Event-time window operators over the ``events`` table (batch form).

Batch equivalents of streaming tumbling/sliding/session windows
(SURVEY.md §7.1 step 8); the Structured Streaming wrappers in
``streaming/`` reuse the same shapes with watermarks. Window starts are
projected as plain timestamps (``date_trunc``-style) rather than Spark's
window structs so results are portable to the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Tumbling windows via ``F.window`` group-by; one shuffle on
    (window, group keys). Projects ``window_start``/``window_end``."""
    out = df.groupBy(F.window(F.col(ts_col), duration).alias("w"), *group_cols).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *rest
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows —
    Spark expands rows before the aggregate (shuffle volume multiplies by
    that factor; keep the ratio small at scale)."""
    out = df.groupBy(F.window(F.col(ts_col), duration, slide).alias("w"), *group_cols).agg(*aggs)
    rest = [c for c in out.columns if c != "w"]
    return out.select(
        F.col("w.start").alias("window_start"), F.col("w.end").alias("window_end"), *rest
    )


def trailing_range_agg(
    df: DataFrame,
    ts_col: str,
    partition_col: str,
    value_col: str,
    span_us: int,
    count_alias: str = "cnt",
    sum_alias: str = "sum",
) -> DataFrame:
    """COUNT(*) and decimal-exact SUM(value) over the event-time frame
    ``[ts - span, ts]`` (both bounds inclusive — DuckDB's
    ``RANGE BETWEEN INTERVAL span PRECEDING AND CURRENT ROW``) per
    ``partition_col``, via the arrival/expiry rewrite.

    Why not ``Window.rangeBetween(-span_us, 0)`` directly: Spark's
    BOUNDED sliding frame (SlidingWindowFunctionFrame) re-evaluates the
    aggregate over the buffered frame rows for EVERY output row —
    O(rows × frame_size) per partition. The r10 events extrapolation
    measured the consequence: a user owning 10% of a 10M-row table
    (1M-row partition, ~1.4k-row 1h frames) took **222s in one task**,
    vs 3.4s for the same table with uniform users. Unbounded-preceding
    frames are incremental (O(rows)), so rewrite the sliding sum as two
    cumulative ones: each row contributes (+1, +value) at key ``2·t``
    and (−1, −value) at key ``2·(t+span)+1``; the running total over
    (key ASC, RANGE UNBOUNDED PRECEDING) at an arrival key equals
    exactly the frame aggregate — expiries sort strictly after the
    arrivals they must not affect (odd keys), and same-``ts`` arrivals
    share a key so the RANGE frame includes all of them (inclusive
    bounds). Measured (min-of-2, same tables): hot partition 222.58s →
    14.11s (16×, the residual being the single-partition 2M-row sort +
    linear scan a per-key ordered sum inherently serializes), uniform
    100× 3.36 → 3.88s, base sf0.1 0.79 → 1.01s — the 2×-rows union and
    one sort cost ~25% when no key is hot, so the direct frame stays
    the default and this is the shape to pick when keys can be hot.

    Bit-portability: contributions are cast to DECIMAL(28,10) before
    the signed cumulative sum; decimal addition/subtraction is exact,
    so the result equals the direct decimal frame sum to the last bit
    and the final double cast matches DuckDB.
    """
    t = F.unix_micros(F.col(ts_col))
    arr = df.select(
        *df.columns,
        (t * 2).alias("_k"),
        F.lit(1).cast("bigint").alias("_dc"),
        F.col(value_col).cast("decimal(28,10)").alias("_dv"),
    )
    exp = df.select(
        *df.columns,
        ((t + F.lit(span_us)) * 2 + 1).alias("_k"),
        F.lit(-1).cast("bigint").alias("_dc"),
        (-F.col(value_col).cast("decimal(28,10)")).alias("_dv"),
    )
    w = (
        Window.partitionBy(partition_col)
        .orderBy("_k")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        arr.unionByName(exp)
        .select(
            *df.columns,
            "_dc",
            F.sum("_dc").over(w).alias(count_alias),
            F.sum("_dv").over(w).cast("double").alias(sum_alias),
        )
        .where(F.col("_dc") == 1)
        .drop("_dc")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap_minutes: int,
) -> DataFrame:
    """Gap-based sessionization in batch: lag + cumulative-sum of
    session-break flags per key. Two window passes over one shuffle on
    the key; the streaming twin is ``F.session_window``.

    Returns the input plus ``session_id`` (``<key>-<n>``, 1-based per key).
    """
    by_key = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("event_id"))
    prev_ts = F.lag(F.col(ts_col)).over(by_key)
    gap_sec = gap_minutes * 60
    is_break = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("double") - prev_ts.cast("double")) > gap_sec),
        1,
    ).otherwise(0)
    sess_n = F.sum(is_break).over(
        Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "session_id", F.concat_ws("-", F.col(key_col).cast("string"), sess_n.cast("string"))
    )
