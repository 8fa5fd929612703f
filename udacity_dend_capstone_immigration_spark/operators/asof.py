"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right, ...)`` attaches, to each left row, the most
recent right row with the same key and ``right.ts <= left.ts`` (backward
as-of; the only direction implemented — it is the point-in-time lookup
shape). Implemented as the union-tag trick, NOT a range join:

1. union left and right rows tagged by side, carrying right's payload
   columns (left rows carry nulls);
2. one window pass per key ordered by (ts, side-priority): ``last_value
   (payload, ignorenulls)`` propagates the latest right payload forward;
3. keep left rows.

Cost model: one shuffle of both inputs on the key + a sort within
partitions — same price as a sort-merge join, with none of the
O(left × right-per-key) blowup a `BETWEEN` range join suffers. Skewed
keys are handled by AQE the same way a regular SMJ is.

Ties: a right row at exactly left.ts IS visible (<=), achieved by
sorting right rows before left rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus ``payload``
    columns from the most recent right row at-or-before ``left_ts``
    (nulls when no right row precedes).

    ``tolerance`` (an INTERVAL string, e.g. ``"30 minutes"``) bounds
    how stale the matched right row may be — pandas ``merge_asof``
    tolerance semantics: matches older than ``left_ts - tolerance``
    are nulled out. Implemented by propagating the matched right
    timestamp through the same window pass, so the bound costs zero
    extra shuffles."""
    l_cols = left.columns
    tagged_left = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # sorts after right at equal ts
        *[F.col(c) for c in l_cols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_p__rts"),
    )
    tagged_right = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(right_ts).alias("_p__rts"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *l_cols,
        F.col("_side"),
        F.col("_ts"),
        *[
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload
        ],
        F.last(F.col("_p__rts"), ignorenulls=True).over(w).alias("_rts"),
    )
    out = filled.where(F.col("_side") == 1)
    if tolerance is not None:
        fresh = F.col("_rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.select(
            *l_cols,
            F.col("_side"),
            *[F.when(fresh, F.col(c)).alias(c) for c in payload],
        )
    return out.select(*l_cols, *payload)
