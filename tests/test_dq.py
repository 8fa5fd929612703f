"""DQ framework (reference etl.py:360-411 with the missing-`raise` bug
deliberately fixed — SURVEY.md §2.11)."""

import pytest

from udacity_dend_capstone_immigration_spark.plans.dq import DQCheck, DQError


def test_non_empty_passes(spark):
    df = spark.createDataFrame([(1,)], "a int")
    chk = DQCheck().non_empty(df, "t")
    assert chk.passed == ["non_empty:t"]


def test_non_empty_raises_on_empty(spark):
    df = spark.createDataFrame([], "a int")
    with pytest.raises(DQError, match="empty"):
        DQCheck().non_empty(df, "t")


def test_referential_subset_passes(spark):
    fact = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "k string")
    dim = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    DQCheck().referential(fact, "k", dim, "k")


def test_referential_subset_raises_on_orphan(spark):
    fact = spark.createDataFrame([("a",), ("z",)], "k string")
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    with pytest.raises(DQError, match="missing from dimension"):
        DQCheck().referential(fact, "k", dim, "k")


def test_strict_equality_reference_parity(spark):
    # reference check demands the fact exercise EVERY dim value — a fact
    # that is a strict subset fails even though referentially sound
    fact = spark.createDataFrame([("a",)], "k string")
    dim = spark.createDataFrame([("a",), ("b",)], "k string")
    DQCheck().referential(fact, "k", dim, "k")  # subset mode: fine
    with pytest.raises(DQError, match="inconsistent"):
        DQCheck().referential(fact, "k", dim, "k", strict_equality=True)


def test_constraint_report_metrics_and_failures(spark):
    import pytest
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.plans.dq import constraint_report

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 50.0), (2, "c", -1.0), (4, "d", 7.0)],
        "k long, s string, v double",
    )
    out = {
        r["constraint"]: (r["metric"], r["passed"])
        for r in constraint_report(
            df,
            [
                ("s_complete", "completeness", F.col("s"), 1.0),
                ("v_positive", "satisfies", F.col("v") > 0, 0.9),
                ("k_unique", "uniqueness", F.col("k"), 1.0),
            ],
        ).collect()
    }
    assert out["s_complete"] == (0.75, False)
    assert out["v_positive"] == (0.75, False)
    assert out["k_unique"] == (0.75, False)
    with pytest.raises(ValueError):
        constraint_report(df, [("x", "nope", F.col("k"), 1.0)]).collect()
