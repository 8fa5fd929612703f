"""grouped_running_sum: adaptive range-exchange/window prefix sums."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.cumsum import grouped_running_sum


def _reference(df, group, order, value):
    w = (
        Window.partitionBy(group)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("running_sum", F.sum(value).over(w).cast("bigint"))


@pytest.mark.parametrize("shape", ["window", "range"])
def test_matches_plain_window(spark, shape):
    df = spark.createDataFrame(
        [(i % 5, i, (i * 7) % 13 + 1) for i in range(500)],
        "g int, k int, v int",
    ).repartition(8)
    got = grouped_running_sum(df, "g", ["k"], "v", shape=shape).orderBy("g", "k").collect()
    want = _reference(df, "g", [F.col("k")], "v").orderBy("g", "k").collect()
    assert [(r["g"], r["k"], r["running_sum"]) for r in got] == [
        (r["g"], r["k"], r["running_sum"]) for r in want
    ]


@pytest.mark.parametrize("shape", ["window", "range"])
def test_desc_order_and_total(spark, shape):
    df = spark.createDataFrame(
        [("a", 3, 10), ("a", 1, 5), ("a", 2, 7), ("b", 9, 2)],
        "g string, k int, v int",
    )
    out = {
        (r["g"], r["k"]): (r["running_sum"], r["total"])
        for r in grouped_running_sum(
            df, "g", [F.desc("k")], "v", total_col="total", shape=shape
        ).collect()
    }
    assert out == {
        ("a", 3): (10, 22),
        ("a", 2): (17, 22),
        ("a", 1): (22, 22),
        ("b", 9): (2, 2),
    }


@pytest.mark.parametrize("shape", ["window", "range"])
def test_empty_input(spark, shape):
    df = spark.createDataFrame([], "g string, k int, v int")
    assert grouped_running_sum(df, "g", ["k"], "v", shape=shape).count() == 0


def test_no_single_task_sort(spark):
    """The range shape's plan must contain no per-group window over the
    raw rows — i.e. no Window whose partition spec is the group column
    alone; the window runs per physical partition (the _PID prefix)."""
    df = spark.createDataFrame(
        [(i % 3, i, 1) for i in range(100)], "g int, k int, v int"
    )
    plan = (
        grouped_running_sum(df, "g", ["k"], "v", shape="range")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Window " in line and "windowspecdefinition" in line:
            assert "_rsum_pid" in line  # every window is PID-prefixed


def test_auto_small_input_uses_window_shape(spark, tmp_path):
    """A small file-backed input under auto must take the plain-window
    shape: no range exchange, no PID column, no construction-time jobs'
    machinery in the plan. (A createDataFrame input would NOT qualify:
    RDD-backed plans report unknown size and auto correctly falls back
    to the range shape — covered below.)"""
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(i % 3, i, 1) for i in range(100)], "g int, k int, v int"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = (
        grouped_running_sum(df, "g", ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "_rsum_pid" not in plan
    assert "windowspecdefinition" in plan  # it IS the plain window


def test_auto_large_estimate_uses_range_shape(spark):
    """Auto must take the range shape both when the estimate exceeds the
    threshold and when the input size is unknowable (RDD-backed plans
    report Long.MaxValue) — the large-input path never sorts one group
    per task (same pin as test_no_single_task_sort, reached via auto)."""
    df = spark.createDataFrame(
        [(i % 3, i, 1) for i in range(100)], "g int, k int, v int"
    )
    for kwargs in ({}, {"window_max_bytes": -1}):
        plan = (
            grouped_running_sum(df, "g", ["k"], "v", **kwargs)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "_rsum_pid" in plan
        for line in plan.splitlines():
            if "Window " in line and "windowspecdefinition" in line:
                assert "_rsum_pid" in line


def test_offsets_broadcast_join_fallback(spark):
    """Above max_map_entries the offsets ship as a broadcast-joined
    frame: results identical, no create_map literal in the plan (plan
    size stays bounded at adversarial partitions×groups counts)."""
    df = spark.createDataFrame(
        [(i % 40, i, (i * 3) % 7 + 1) for i in range(400)],
        "g int, k int, v int",
    ).repartition(16)
    out = grouped_running_sum(
        df, "g", ["k"], "v", total_col="total", shape="range", max_map_entries=1
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # no create_map literal: the map path's \x1f-joined keys never
    # appear — plan size stays O(1) in offsets count
    assert "\x1f" not in plan
    got = {(r["g"], r["k"]): (r["running_sum"], r["total"]) for r in out.collect()}
    ref = _reference(df, "g", [F.col("k")], "v")
    wt = Window.partitionBy("g")
    ref = ref.withColumn("total", F.sum("v").over(wt).cast("bigint"))
    want = {(r["g"], r["k"]): (r["running_sum"], r["total"]) for r in ref.collect()}
    assert got == want


def test_property_matches_plain_window(spark):
    """Hypothesis: arbitrary (group, key, value) batches — the range-
    exchange prefix sum must equal the plain window on every draw,
    including duplicate order keys broken by a tiebreaker, negative
    values, single-row groups, and one-group inputs."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[
            HealthCheck.function_scoped_fixture,
            HealthCheck.too_slow,
        ],
    )
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # group
                st.integers(min_value=0, max_value=9),      # order key (dups ok)
                st.integers(min_value=-1000, max_value=1000),  # value
            ),
            min_size=1,
            max_size=80,
        )
    )
    def prop(rows):
        data = [(g, k, i, v) for i, (g, k, v) in enumerate(rows)]
        df = spark.createDataFrame(data, "g int, k int, tie int, v int").repartition(5)
        got = sorted(
            (r["g"], r["k"], r["tie"], r["running_sum"])
            for r in grouped_running_sum(
                df, "g", ["k", "tie"], "v", shape="range"
            ).collect()
        )
        want = sorted(
            (r["g"], r["k"], r["tie"], r["running_sum"])
            for r in _reference(df, "g", [F.col("k"), F.col("tie")], "v").collect()
        )
        assert got == want

    prop()


@pytest.mark.parametrize("max_map", [10_000, 1])
def test_null_group_keys(spark, max_map):
    """NULL groups must form their own group in BOTH offset-shipping
    modes (concat_ws drops null operands, so a naive key would alias
    null groups onto the bare-pid key — the sentinel prevents that)."""
    df = spark.createDataFrame(
        [("a", 1, 10), (None, 1, 5), (None, 2, 7), ("a", 2, 3)],
        "g string, k int, v int",
    )
    out = {
        (r["g"], r["k"]): (r["running_sum"], r["total"])
        for r in grouped_running_sum(
            df, "g", ["k"], "v", total_col="total", shape="range",
            max_map_entries=max_map,
        ).collect()
    }
    assert out == {
        ("a", 1): (10, 13),
        ("a", 2): (13, 13),
        (None, 1): (5, 12),
        (None, 2): (12, 12),
    }


def test_unsupported_group_key_type_raises(spark):
    df = spark.createDataFrame([(1.5, 1, 1)], "g double, k int, v int")
    with pytest.raises(TypeError, match="unsupported"):
        grouped_running_sum(df, "g", ["k"], "v")
    dfb = spark.createDataFrame([(True, 1, 1)], "g boolean, k int, v int")
    with pytest.raises(TypeError, match="unsupported"):
        grouped_running_sum(dfb, "g", ["k"], "v")
    with pytest.raises(ValueError, match="shape"):
        grouped_running_sum(
            spark.createDataFrame([(1, 1, 1)], "g int, k int, v int"),
            "g", ["k"], "v", shape="bogus",
        )
