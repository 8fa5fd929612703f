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
    StringType,
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


class _IntegerTotalsProcessor:
    """Spark 4 arbitrary-state processor: the transformWithState twin of
    :func:`integer_totals_stateful`. Per-key ValueState (cnt, millis)
    maintained by the state store; one emission per key per batch."""

    def init(self, handle) -> None:
        self._totals = handle.getValueState("totals", "cnt BIGINT, millis BIGINT")

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        cnt, millis = self._totals.get() if self._totals.exists() else (0, 0)
        for pdf in rows:
            cnt += len(pdf)
            millis += int(
                np.floor(pdf["value"].to_numpy() * 1000.0).astype("int64").sum()
            )
        self._totals.update((cnt, millis))
        yield pd.DataFrame(
            {"user_id": [key[0]], "event_cnt": [cnt], "value_millis": [millis]}
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        return iter(())

    def handleInitialState(self, key, initialState, timerValues) -> None:
        pass

    def close(self) -> None:
        pass


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas``'s Python-side state server speaks
    protobuf to the JVM; without the ``protobuf`` package the streaming
    worker crashes at initialization (STREAMING_PYTHON_RUNNER_
    INITIALIZATION_FAILURE). Probe the dependency up front so callers
    fail loudly at plan time instead of mid-stream."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def integer_totals_transform_with_state(
    events: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Per-key running integer totals via ``transformWithStateInPandas``
    (Spark 4's arbitrary-state API — typed ValueState/ListState/MapState
    per key, timers, TTL — superseding ``applyInPandasWithState``).

    Same fold and same output contract as
    :func:`integer_totals_stateful`, so the two APIs are interchangeable
    and the test suite asserts they emit identical rows (or the loud
    capability failure where protobuf is unavailable — the same
    gate-don't-silently-claim policy as the SAS7BDAT and Delta paths).
    State is a fixed-width (cnt, millis) value per active key —
    state-store size is O(active keys) regardless of input volume.
    """
    if not transform_with_state_available():
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package in the "
            "Python workers (google.protobuf not importable). Use "
            "integer_totals_stateful (applyInPandasWithState) instead."
        )
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    cls = type(
        "IntegerTotalsProcessor", (_IntegerTotalsProcessor, StatefulProcessor), {}
    )
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=cls(),
        outputStructType=INTEGER_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


TRANSITION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("pair_cnt", LongType()),
    ]
)

_TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("last_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _update_transitions(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Ordered-state CEP fold: sort this batch's rows by (ts, event_id),
    chain them onto the stored last event, emit per-(prev, next) pair
    counts for the batch. State is one (ts, id, type) triple per user —
    O(active keys), never O(events)."""
    batch = pd.concat(list(pdfs), ignore_index=True)
    if batch.empty:
        return
    batch = batch.sort_values(["ts_us", "event_id"], kind="mergesort")
    types = batch["event_type"].tolist()
    if state.exists:
        _, _, last_type = state.get
        seq = [last_type] + types
    else:
        seq = types
    tail = batch.iloc[-1]
    state.update((int(tail["ts_us"]), int(tail["event_id"]), str(tail["event_type"])))
    pairs: dict[tuple[str, str], int] = {}
    for a, b in zip(seq, seq[1:]):
        pairs[(a, b)] = pairs.get((a, b), 0) + 1
    if not pairs:
        return
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(pairs),
            "prev_type": [a for a, _ in pairs],
            "next_type": [b for _, b in pairs],
            "pair_cnt": list(pairs.values()),
        }
    )


def transition_counts_stateful(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming event-type transition counts — the stateful twin of the
    batch ``events_transition_matrix`` lag query. ``lag()`` windows are
    unsupported over unbounded streams, so the per-user order is
    maintained as explicit state: the last (ts, id, type) triple chains
    each micro-batch onto the previous one. Requires an integer-micros
    ``ts_us`` column (exact state round-trip; timestamps in state
    columns invite tz/precision drift)."""
    return events.groupBy(key_col).applyInPandasWithState(
        _update_transitions,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
