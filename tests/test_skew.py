"""salted_join result-equivalence with a plain join under heavy skew."""

import pytest
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 1 (the hot key)
    rows = [(1 if i % 10 else i, float(i)) for i in range(1000)]
    large = spark.createDataFrame(rows, "k long, v double")
    small = spark.createDataFrame([(k, f"dim_{k}") for k in range(0, 1000, 10)], "k long, name string")
    return large, small


def test_salted_inner_equals_plain(skewed):
    large, small = skewed
    plain = large.join(small, "k").orderBy("k", "v")
    salted = salted_join(large, small, "k", salt_buckets=8).orderBy("k", "v")
    assert plain.collect() == salted.collect()


def test_salted_left_keeps_unmatched(skewed):
    large, small = skewed
    plain = large.join(small, "k", "left").orderBy("k", "v")
    salted = salted_join(large, small, "k", salt_buckets=4, how="left").orderBy("k", "v")
    assert plain.collect() == salted.collect()


def test_salt_actually_spreads_hot_key(spark, skewed):
    large, _ = skewed
    from udacity_dend_capstone_immigration_spark.operators.skew import SALT_COL

    salted = large.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(8)).cast("int")
    )
    buckets = salted.where("k = 1").select(SALT_COL).distinct().count()
    assert buckets >= 6  # hot key spread over (nearly) all 8 buckets


def test_rejects_unsupported_how(skewed):
    large, small = skewed
    with pytest.raises(ValueError):
        salted_join(large, small, "k", how="full")


def test_salted_count_sum_matches_plain_aggregate(spark):
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.operators.skew import salted_count_sum

    df = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i) / 7) for i in range(1000)],
        "id long, k string, v double",
    )
    salted = {
        r["k"]: (r["cnt"], r["total"])
        for r in salted_count_sum(df, ["k"], "v", salt_buckets=8).collect()
    }
    plain = {
        r["k"]: (r["cnt"], r["total"])
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("v").cast("decimal(28,10)")).cast("double").alias("total"),
        )
        .collect()
    }
    assert salted == plain


def test_salted_count_sum_row_id_spreads_duplicate_rows(spark):
    """The degenerate hot key whose rows are EXACT duplicates collapses
    the full-row salt to one bucket (r2 advice); mixing in a unique
    row-id column restores the fan-out while keeping the same totals."""
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.operators.skew import (
        SALT_COL,
        salted_count_sum,
    )

    df = (
        spark.range(1000)
        .select(
            F.col("id").alias("rid"),
            F.lit("hot").alias("k"),
            F.lit(7.0).alias("v"),  # every row identical apart from rid
        )
    )
    out = salted_count_sum(df, ["k"], "v", salt_buckets=8, row_id_col="rid").collect()
    assert [(r["k"], r["cnt"], r["total"]) for r in out] == [("hot", 1000, 7000.0)]
    # the partial stage actually fans out: distinct salts over the rid hash > 1
    n_salts = (
        df.withColumn(SALT_COL, F.pmod(F.xxhash64("rid"), F.lit(8)).cast("int"))
        .select(SALT_COL)
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_salted_count_sum_rejects_unknown_row_id(spark):
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.operators.skew import salted_count_sum

    df = spark.createDataFrame([(1, 2.0)], "k int, v double")
    with _pytest.raises(ValueError, match="nope"):
        salted_count_sum(df, ["k"], "v", row_id_col="nope")


def test_hot_shingle_grouped_pairs_complete_and_join_free(spark):
    """Hot-shingle scale contract for the grouped substring_run_pairs
    shape (round-5 rewrite of the VERDICT r2 #8 scenario).

    A shingle shared by D docs used to make one self-join key carry D
    rows per side (the straggler AQE skew-split had to rescue). The
    grouped shape instead collects the match group once and generates
    pairs by double-explode inside the group, so: (a) the D^2 pair set
    is still complete and correct, (b) the executed plan contains NO
    join at all — one Exchange for the group stage, one for the
    run-window — and (c) the ``max_shingle_df`` cap drops the hot group
    outright, which is the production guard bounding per-group fan-out
    on boilerplate-heavy corpora.
    """
    from udacity_dend_capstone_immigration_spark.operators.dedup import substring_run_pairs

    hot = "alpha beta gamma delta epsilon"  # one 5-gram shared by all docs
    docs = spark.createDataFrame(
        [(f"d{i:04d}", f"{hot} u{i:04d}") for i in range(400)],
        "doc_id string, text string",
    )
    pairs = substring_run_pairs(
        docs, "doc_id", "text", shingle_n=5, min_tokens=5, max_shingle_df=None
    )
    rows = pairs.collect()
    # every doc pair shares exactly the 5-token run
    assert len(rows) == 400 * 399 // 2
    assert all(r["max_run_tokens"] == 5 for r in rows)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, f"pair generation should be join-free:\n{plan[:2000]}"

    # the stop-shingle cap removes the hot group before any fan-out
    capped = substring_run_pairs(
        docs, "doc_id", "text", shingle_n=5, min_tokens=5, max_shingle_df=100
    )
    assert capped.count() == 0
