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
