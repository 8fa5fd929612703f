"""Distributed rank / equi-depth bucketing must reproduce the
unpartitioned window exactly (the DuckDB oracles keep plain ntile)."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.quantiles import (
    equi_depth_buckets,
    global_rank,
)


def test_global_rank_matches_window_row_number(spark):
    df = spark.range(1000).select(
        (F.col("id") * 37 % 101).alias("v"), F.col("id").alias("k")
    )
    got = {
        (r["v"], r["k"]): r["rank"]
        for r in global_rank(df, ["v", "k"]).collect()
    }
    want = {
        (r["v"], r["k"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert got == want


def test_equi_depth_matches_ntile_all_k(spark):
    df = spark.range(97).select(
        (F.col("id") * 13 % 31).alias("v"), F.col("id").alias("k")
    )
    for k in (1, 4, 10, 96, 97, 200):  # n % k != 0, k == n, k > n
        got = {
            (r["v"], r["k"]): r["bucket"]
            for r in equi_depth_buckets(df, ["v", "k"], k).collect()
        }
        want = {
            (r["v"], r["k"]): r["bucket"]
            for r in df.withColumn(
                "bucket", F.ntile(k).over(Window.orderBy("v", "k"))
            ).collect()
        }
        assert got == want, k


def test_equi_depth_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("v"))
    assert equi_depth_buckets(df, ["v"], 4).collect() == []
