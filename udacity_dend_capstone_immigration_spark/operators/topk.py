"""Top-k operators (T1-T2; reference notebook cells 45-47).

``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` — each
partition keeps a k-element heap and the driver merges per-partition heaps,
so no global sort ever materializes. That is exactly the plan you want at
100 TB: O(n) scan, O(k) state per task.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. Callers should include a unique tiebreaker column in
    ``order_by`` whenever the primary sort key can tie — without it the
    result set is nondeterministic across engines and runs."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k per group via ``row_number`` (SURVEY.md §2.5: the idiomatic
    generalization of the reference's ORDER BY/LIMIT subqueries).

    One shuffle on the partition keys; ranking is pipelined within each
    partition. Skewed groups are handled by AQE skew-split.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
