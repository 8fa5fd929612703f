"""trailing_range_agg (arrival/expiry rewrite) equals the direct
bounded RANGE frame bit-for-bit.

The rewrite exists because Spark's bounded sliding frame re-evaluates
the aggregate over the buffered frame for every output row —
O(rows x frame) per partition; the r10 events extrapolation measured
222s for one hot-user task at 10M rows where the rewrite is
sub-second. These tests pin the semantics the rewrite must preserve:
inclusive bounds on both frame edges, same-timestamp peers all seeing
each other, exact decimal sums, and hot-key partitions.
"""

import datetime as dt
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.windows import trailing_range_agg

SPAN_US = 3_600_000_000  # 1 hour


def direct(df, span_us=SPAN_US):
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-span_us, 0)
    )
    return df.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("cnt"),
        F.sum(F.col("value").cast("decimal(28,10)")).over(w).cast("double").alias("sum"),
    )


def rewrite(df, span_us=SPAN_US):
    return trailing_range_agg(
        df.select("event_id", "user_id", "ts", "value"),
        "ts",
        "user_id",
        "value",
        span_us,
        count_alias="cnt",
        sum_alias="sum",
    ).select("event_id", "user_id", "ts", "cnt", "sum")


def make_events(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (i, u, t0 + dt.timedelta(microseconds=off_us), v) for i, (u, off_us, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )


@pytest.fixture(scope="module")
def random_events(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(600):
        # user 0 is hot (~40% of rows); timestamps cluster inside a few
        # hours so frames genuinely overlap; duplicates forced below
        u = 0 if rng.random() < 0.4 else rng.randrange(1, 12)
        off = rng.randrange(0, 6 * SPAN_US)
        rows.append((u, off, round(rng.random() * 500, 2)))
    # same-timestamp peers: three rows sharing one ts on the hot user,
    # two exactly span_us apart (inclusive-bound edge)
    rows += [(0, 12345, 1.25), (0, 12345, 2.5), (0, 12345, 4.0)]
    rows += [(3, 1000, 10.0), (3, 1000 + SPAN_US, 20.0)]
    return make_events(spark, rows)


def test_rewrite_equals_direct_frame(random_events):
    got = sorted(rewrite(random_events).collect())
    want = sorted(direct(random_events).collect())
    assert got == want


def test_inclusive_lower_bound_and_peers(spark):
    # b is exactly span before c -> counted; a is span+1us before c -> not
    df = make_events(
        spark,
        [(1, 0, 1.0), (1, 1, 2.0), (1, 1 + SPAN_US, 4.0), (1, 1 + SPAN_US, 8.0)],
    )
    out = {r.event_id: (r.cnt, r.sum) for r in rewrite(df).collect()}
    assert out[2] == (3, 14.0)  # peers 2&3 plus row 1; row 0 expired
    assert out[3] == (3, 14.0)  # same-ts peer sees identical frame
    assert out[0] == (1, 1.0)
    assert out[1] == (2, 3.0)


def test_output_rows_match_input(random_events):
    assert rewrite(random_events).count() == random_events.count()
    # expiry rows never leak: every event_id appears exactly once
    n_distinct = rewrite(random_events).select("event_id").distinct().count()
    assert n_distinct == random_events.count()


def test_plan_uses_only_unbounded_frames(random_events):
    # the whole point: no bounded sliding frame in the physical plan
    plan = rewrite(random_events)._jdf.queryExecution().executedPlan().toString()
    assert "unboundedpreceding$(), currentrow$()" in plan
    assert "specifiedwindowframe(RangeFrame, -" not in plan
