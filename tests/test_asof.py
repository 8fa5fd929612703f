"""As-of join edge semantics: no-prior-row nulls, equal-ts visibility,
per-key isolation, latest-wins."""

import datetime as dt

from udacity_dend_capstone_immigration_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01 10:00:00")),   # before any right row → nulls
            (2, 10, _ts("2024-01-01 12:00:00")),   # equal ts → right row visible
            (3, 10, _ts("2024-01-01 15:00:00")),   # latest prior wins (12:00 not 11:00)
            (4, 20, _ts("2024-01-01 23:00:00")),   # other key: only its own rows
        ],
        "id long, k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01 11:00:00"), 100.0),
            (10, _ts("2024-01-01 12:00:00"), 200.0),
            (20, _ts("2024-01-01 09:00:00"), 999.0),
        ],
        "k long, ts timestamp, px double",
    )
    out = {
        r["id"]: r["px"]
        for r in asof_join(left, right, "k", "k", "ts", "ts", ["px"]).collect()
    }
    assert out == {1: None, 2: 200.0, 3: 200.0, 4: 999.0}


def test_asof_join_keeps_all_left_rows_and_columns(spark):
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 00:00:00"), "extra")],
        "id long, k long, ts timestamp, note string",
    )
    right = spark.createDataFrame([], "k long, ts timestamp, px double")
    out = asof_join(left, right, "k", "k", "ts", "ts", ["px"]).collect()
    assert len(out) == 1
    assert out[0]["note"] == "extra" and out[0]["px"] is None


def test_asof_tolerance_nulls_stale_matches(spark):
    from datetime import datetime

    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 12, 0)),   # click 11:50 → fresh
            (2, datetime(2024, 1, 1, 12, 0)),   # click 10:00 → stale
            (3, datetime(2024, 1, 1, 12, 0)),   # no click at all
        ],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 11, 50), 10.0),
            (2, datetime(2024, 1, 1, 10, 0), 20.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        r["k"]: r["v"]
        for r in asof_join(
            left, right, "k", "k", "ts", "ts", ["v"], tolerance="30 minutes"
        ).collect()
    }
    assert out == {1: 10.0, 2: None, 3: None}
    # without tolerance the stale match is kept
    base = {
        r["k"]: r["v"]
        for r in asof_join(left, right, "k", "k", "ts", "ts", ["v"]).collect()
    }
    assert base == {1: 10.0, 2: 20.0, 3: None}
