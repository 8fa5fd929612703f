"""Bucketed range (interval) join.

``point ∈ [start, end)`` joins compile to BroadcastNestedLoopJoin (or a
full cartesian) in Spark — O(left × right) comparisons. The scalable
pattern: quantize time into fixed buckets, explode each interval into
the buckets it overlaps, and equi-join on the bucket, keeping the exact
range predicate as a residual filter. Shuffle key becomes the bucket, so
work is O(points + intervals × avg_buckets_per_interval), and Catalyst
plans a plain hash join.

Bucket width tuning is the usual trade: wide buckets → fewer replicated
interval rows but more residual-filter waste; narrow → the reverse.
Pick roughly the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, width_sec: int) -> Column:
    return F.floor(col.cast("double") / width_sec).cast("long")


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width_sec: int = 86_400,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= point_ts < end``. Timestamps are compared as instants;
    buckets are epoch-second quanta of ``bucket_width_sec``.
    Returns all columns of both inputs.
    """
    p = points.withColumn("_b", _bucket(F.col(point_ts), bucket_width_sec))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                _bucket(F.col(start_ts), bucket_width_sec),
                # end is exclusive, but an interval touching a bucket's
                # first instant still overlaps it — ceil via (end - 1µs)
                _bucket(F.col(end_ts).cast("double") - F.lit(1e-6), bucket_width_sec),
            )
        ),
    )
    return (
        p.join(iv, "_b")
        .where((F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts)))
        .drop("_b")
    )
