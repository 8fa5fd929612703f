"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for operators Spark's built-in streaming aggregates
can't express: arbitrary per-key state carried across micro-batches,
exchanged as Arrow batches (never row-at-a-time Python). Shuffle is one
hash exchange on the key; state lives in the state store, sized by
active keys only.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_cnt", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("cnt", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch's rows for this key into (count, total)
    state; emit the updated running totals once per batch."""
    cnt, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
    state.update((cnt, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "event_cnt": [cnt], "total_value": [total]}
    )


def running_totals_stateful(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, sum(value)) maintained across micro-batches.

    The batch twin is a plain ``groupBy(key).agg(count, sum)`` — the test
    suite asserts the final emitted state matches it exactly.
    """
    return events.groupBy(key_col).applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


INTEGER_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_cnt", LongType()),
        StructField("value_millis", LongType()),
    ]
)

_INT_STATE_SCHEMA = StructType(
    [StructField("cnt", LongType()), StructField("millis", LongType())]
)


def _update_integer_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Integer fold: count + sum(floor(value*1000)) — order-independent,
    so the emitted totals are bit-identical to any batch engine."""
    import numpy as np

    cnt, millis = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        cnt += len(pdf)
        millis += int(np.floor(pdf["value"].to_numpy() * 1000.0).astype("int64").sum())
    state.update((cnt, millis))
    yield pd.DataFrame(
        {"user_id": [key[0]], "event_cnt": [cnt], "value_millis": [millis]}
    )


def integer_totals_stateful(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running (count, integer-milli sum) — the oracle-matchable
    variant of :func:`running_totals_stateful`."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_integer_totals,
        outputStructType=INTEGER_TOTALS_SCHEMA,
        stateStructType=_INT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
