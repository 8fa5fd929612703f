"""grouped_running_sum: range-exchange prefix sums vs the plain window."""

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


def test_matches_plain_window(spark):
    df = spark.createDataFrame(
        [(i % 5, i, (i * 7) % 13 + 1) for i in range(500)],
        "g int, k int, v int",
    ).repartition(8)
    got = grouped_running_sum(df, "g", ["k"], "v").orderBy("g", "k").collect()
    want = _reference(df, "g", [F.col("k")], "v").orderBy("g", "k").collect()
    assert [(r["g"], r["k"], r["running_sum"]) for r in got] == [
        (r["g"], r["k"], r["running_sum"]) for r in want
    ]


def test_desc_order_and_total(spark):
    df = spark.createDataFrame(
        [("a", 3, 10), ("a", 1, 5), ("a", 2, 7), ("b", 9, 2)],
        "g string, k int, v int",
    )
    out = {
        (r["g"], r["k"]): (r["running_sum"], r["total"])
        for r in grouped_running_sum(
            df, "g", [F.desc("k")], "v", total_col="total"
        ).collect()
    }
    assert out == {
        ("a", 3): (10, 22),
        ("a", 2): (17, 22),
        ("a", 1): (22, 22),
        ("b", 9): (2, 2),
    }


def test_empty_input(spark):
    df = spark.createDataFrame([], "g string, k int, v int")
    assert grouped_running_sum(df, "g", ["k"], "v").count() == 0


def test_no_single_task_sort(spark):
    """The plan must contain no per-group window over the raw rows —
    i.e. no Window whose partition spec is the group column alone; the
    window runs per physical partition (the _PID prefix)."""
    df = spark.createDataFrame(
        [(i % 3, i, 1) for i in range(100)], "g int, k int, v int"
    )
    plan = grouped_running_sum(df, "g", ["k"], "v")._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window " in line and "windowspecdefinition" in line:
            assert "_rsum_pid" in line  # every window is PID-prefixed


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
            for r in grouped_running_sum(df, "g", ["k", "tie"], "v").collect()
        )
        want = sorted(
            (r["g"], r["k"], r["tie"], r["running_sum"])
            for r in _reference(df, "g", [F.col("k"), F.col("tie")], "v").collect()
        )
        assert got == want

    prop()


def test_null_group_keys(spark):
    """NULL groups must form their own group (concat_ws drops null
    operands, so a naive key would alias null groups onto the bare-pid
    key — the sentinel prevents that)."""
    df = spark.createDataFrame(
        [("a", 1, 10), (None, 1, 5), (None, 2, 7), ("a", 2, 3)],
        "g string, k int, v int",
    )
    out = {
        (r["g"], r["k"]): (r["running_sum"], r["total"])
        for r in grouped_running_sum(df, "g", ["k"], "v", total_col="total").collect()
    }
    assert out == {
        ("a", 1): (10, 13),
        ("a", 2): (13, 13),
        (None, 1): (5, 12),
        (None, 2): (12, 12),
    }


def test_unsupported_group_key_type_raises(spark):
    import pytest

    df = spark.createDataFrame([(1.5, 1, 1)], "g double, k int, v int")
    with pytest.raises(TypeError, match="unsupported"):
        grouped_running_sum(df, "g", ["k"], "v")
    dfb = spark.createDataFrame([(True, 1, 1)], "g boolean, k int, v int")
    with pytest.raises(TypeError, match="unsupported"):
        grouped_running_sum(dfb, "g", ["k"], "v")
