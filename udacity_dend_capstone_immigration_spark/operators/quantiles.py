"""Distributed exact ranking and equi-depth (ntile) bucketing.

``ntile(k) OVER (ORDER BY ...)`` — the classic equi-depth histogram /
quantile-bucket shape — compiles to ``Exchange SinglePartition`` + one
task sorting every row: the canonical scale-killer the r2 verdict
flagged in ``customer_spend_quartiles`` and
``events_equi_depth_histogram``.

This module computes the SAME bucket assignment (bit-identical to the
unpartitioned ``ntile``, so DuckDB oracles keep their plain-SQL form)
without ever funnelling rows through one task:

1. ``repartitionByRange(order_cols)`` — Spark's sampled range exchange
   gives a parallel total order across partitions;
2. ``sortWithinPartitions`` + ``row_number`` per *physical* partition —
   each task ranks only its slice;
3. per-partition row counts (≤ ``spark.sql.shuffle.partitions`` values)
   are collected to the driver, prefix-summed, and broadcast back as a
   literal map — the only driver-side data is one count per partition;
4. global rank = partition offset + local row number, and the ntile
   bucket follows arithmetically from (rank, n, k): the first ``n % k``
   buckets hold ``n/k + 1`` rows, the rest ``n/k``.

The ranked intermediate is ``localCheckpoint(eager=False)``-pinned so
the count job and the output job see the SAME sampled range boundaries
(two executions of a sampled exchange are not guaranteed to split
identically; ranking across disagreeing boundary sets would corrupt
the offsets).

Ties: callers must pass a total order (include a unique tiebreak column,
e.g. ``(value, event_id)``) — the same requirement the oracle's
``ntile(k) OVER (ORDER BY value, event_id)`` has for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "_qtl_pid"
_LRN = "_qtl_lrn"
_RANK = "_qtl_rank"


def global_rank(
    df: DataFrame, order_cols: list[str], rank_col: str = "rank"
) -> DataFrame:
    """``df`` + dense 1-based ``rank_col`` equal to
    ``row_number() OVER (ORDER BY order_cols)`` — computed with a range
    exchange and per-partition windows, never a single-task sort."""
    ranked, _n = _global_rank(df, order_cols, rank_col)
    return ranked


def _global_rank(
    df: DataFrame, order_cols: list[str], rank_col: str
) -> tuple[DataFrame, int]:
    """(ranked df, total row count) — the count rides the same job that
    gathers per-partition offsets, so callers needing ``n`` (ntile) pay
    no extra pass."""
    ranged = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r[_PID]: r["cnt"]
        for r in ranged.groupBy(_PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        offset_map = F.create_map(
            *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
        )
        offset = F.coalesce(offset_map[F.col(_PID)], F.lit(0))
    else:  # empty input: no partitions ever materialized
        offset = F.lit(0)
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    ranked = (
        ranged.withColumn(_LRN, F.row_number().over(w))
        .withColumn(rank_col, (offset + F.col(_LRN)).cast("bigint"))
        .drop(_PID, _LRN)
    )
    return ranked, acc


def ntile_bucket(rank, n: int, k: int):
    """Column expression: the ``ntile(k)`` bucket of 1-based ``rank``
    among ``n`` total rows — first ``n % k`` buckets hold ``n/k + 1``
    rows, the rest ``n/k`` (Spark and DuckDB agree on this split)."""
    base, rem = divmod(n, k)
    if base == 0:
        return rank.cast("int")
    threshold = rem * (base + 1)
    big = F.ceil(rank / F.lit(base + 1))
    small = F.lit(rem) + F.ceil((rank - F.lit(threshold)) / F.lit(base))
    return F.when(rank <= F.lit(threshold), big).otherwise(small).cast("int")


def equi_depth_buckets(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    bucket_col: str = "bucket",
) -> DataFrame:
    """``df`` + ``bucket_col`` = ``ntile(k) OVER (ORDER BY order_cols)``,
    computed scale-safe. One offsets job (tiny collect) + one ranked
    pass; the plan contains no ``Exchange SinglePartition``."""
    ranked, n = _global_rank(df, order_cols, rank_col=_RANK)
    return ranked.withColumn(bucket_col, ntile_bucket(F.col(_RANK), n, k)).drop(
        _RANK
    )
