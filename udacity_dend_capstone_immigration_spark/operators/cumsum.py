"""Distributed grouped running sums (prefix sums).

``SUM(x) OVER (PARTITION BY g ORDER BY ...)`` buffers and sorts every
row of a group in ONE task — fine when groups are small (per-user event
streams), a scale-killer when the group key is low-cardinality over the
whole corpus (per-SOURCE running token totals: one task per source at
100×). This module computes the SAME running sum with the range-exchange
idiom :mod:`.quantiles` established for global ranking:

1. ``repartitionByRange(group, order...)`` — a parallel total order;
   each group spans a contiguous run of partitions;
2. per-``(partition, group)`` partial sums — at most
   ``#partitions + #groups`` rows (contiguous runs), collected to the
   driver and prefix-summed per group;
3. the per-partition offsets broadcast back as a literal map, and the
   within-partition window (each task sorts only its slice) adds its
   local running sum on top.

The ranged intermediate is ``localCheckpoint(eager=False)``-pinned so
the offsets job and the output job see the same sampled range
boundaries (two executions of a sampled exchange may split
differently; offsets computed against a different split would corrupt
the sums — the same pin :func:`..quantiles.global_rank` uses).

Contracts: ``value_col`` must be integral (bigint partial sums are
order-independent; double partials would not be bit-stable across
merge orders), ``order_cols`` must be a total order within each group
(include a unique tiebreaker), the group-key cardinality must be
driver-map-sized (the per-source / per-shard use case — thousands,
not billions; per-user running sums should stay on the plain window,
whose groups are naturally small), and the group key must be a
string/integral type: the offsets map is keyed by the key's STRING
form on both the driver (``str(value)``) and the executor
(``CAST(key AS STRING)``), and those two renderings agree for
strings and integers but not for floats (``1e+20`` vs ``1.0E20``) —
float-keyed groups raise. NULL groups are supported (sentinel key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_rsum_pid"
#: unit-separator: never collides with real key text
_SEP = "\x1f"
#: sentinel string form for a NULL group key
_NULL_KEY = "\x00<null-group>"


def _cols(order_cols: list[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def grouped_running_sum(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column | str],
    value_col: str,
    out_col: str = "running_sum",
    total_col: str | None = None,
) -> DataFrame:
    """``df`` + ``out_col`` = inclusive
    ``SUM(value) OVER (PARTITION BY group ORDER BY order ROWS UNBOUNDED
    PRECEDING)`` — computed with a range exchange and per-partition
    windows, never one task per group. If ``total_col`` is given, the
    per-group grand total is attached too (free: it falls out of the
    same offsets job, saving the usual second window / aggregate+join).
    """
    from pyspark.sql.types import (
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    gtype = df.schema[group_col].dataType
    if not isinstance(
        gtype, (StringType, ByteType, ShortType, IntegerType, LongType, DateType)
    ):
        raise TypeError(
            f"grouped_running_sum: group key type {gtype.simpleString()} is "
            "unsupported — the offsets map is keyed by the key's string "
            "form on driver and executor, and those renderings agree only "
            "for string/integer/date keys (floats: 1e+20 vs 1.0E20; "
            "booleans: True vs true; timestamps: .500000 vs .5); cast the "
            "key to string first"
        )
    order = _cols(order_cols)
    # no explicit sortWithinPartitions: the offsets aggregate is
    # order-free and the output window inserts its own partition sort,
    # so pre-sorting would only double the sort work in the
    # materialization job
    ranged = (
        df.repartitionByRange(F.col(group_col), *order)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    partials = (
        ranged.groupBy(_PID, group_col)
        .agg(F.sum(value_col).alias("_s"))
        .collect()
    )
    offsets: dict[tuple[int, str], int] = {}
    totals: dict[str, int] = {}
    for r in sorted(partials, key=lambda r: r[_PID]):
        g = _NULL_KEY if r[group_col] is None else str(r[group_col])
        offsets[(r[_PID], g)] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + (r["_s"] or 0)

    # NULL groups get a sentinel key (concat_ws silently DROPS null
    # operands, which would alias a null group onto the bare-pid key)
    gkey = F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_KEY))
    key = F.concat_ws(_SEP, F.col(_PID).cast("string"), gkey)
    if offsets:
        offset_map = F.create_map(
            *[
                F.lit(x)
                for (pid, g), off in offsets.items()
                for x in (f"{pid}{_SEP}{g}", off)
            ]
        )
        offset = F.coalesce(offset_map[key], F.lit(0))
    else:  # empty input: no partitions ever materialized
        offset = F.lit(0)

    w = (
        Window.partitionBy(_PID, group_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged.withColumn(
        out_col, (F.sum(value_col).over(w) + offset).cast("bigint")
    )
    if total_col is not None:
        if totals:
            total_map = F.create_map(
                *[F.lit(x) for g, tot in totals.items() for x in (g, tot)]
            )
            total = F.coalesce(
                total_map[
                    F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_KEY))
                ],
                F.lit(0),
            )
        else:
            total = F.lit(0)
        out = out.withColumn(total_col, total.cast("bigint"))
    return out.drop(_PID)
