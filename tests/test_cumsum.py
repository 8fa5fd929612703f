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
