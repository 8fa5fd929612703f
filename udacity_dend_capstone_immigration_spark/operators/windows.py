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
