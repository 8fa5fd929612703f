"""Bucketed range join: boundary inclusivity, bucket-straddling
intervals, equivalence with the naive range predicate."""

import datetime as dt

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.rangejoin import range_join_bucketed


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_boundaries_and_straddling(spark):
    points = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == start → included
            (2, _ts("2024-01-03 00:00:00")),  # == end → excluded
            (3, _ts("2024-01-02 13:00:00")),  # inside, second bucket day
            (4, _ts("2024-02-01 00:00:00")),  # outside
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(10, _ts("2024-01-01 00:00:00"), _ts("2024-01-03 00:00:00"))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    out = range_join_bucketed(points, intervals, "ts", "start_ts", "end_ts")
    assert sorted(r["pid"] for r in out.collect()) == [1, 3]


def test_equivalence_with_naive_range_join(spark):
    points = spark.createDataFrame(
        [(i, _ts("2024-01-01 00:00:00") + dt.timedelta(hours=7 * i)) for i in range(60)],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            (j, _ts("2024-01-01 00:00:00") + dt.timedelta(days=j),
             _ts("2024-01-01 00:00:00") + dt.timedelta(days=j, hours=30))
            for j in range(12)
        ],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    naive = points.join(
        intervals,
        (points.ts >= intervals.start_ts) & (points.ts < intervals.end_ts),
    ).select("pid", "iid")
    bucketed = range_join_bucketed(points, intervals, "ts", "start_ts", "end_ts").select("pid", "iid")
    assert sorted(map(tuple, naive.collect())) == sorted(map(tuple, bucketed.collect()))
