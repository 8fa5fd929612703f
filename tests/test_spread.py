"""spread_scan: conditional round-robin for unsplittable scans."""

from udacity_dend_capstone_immigration_spark.operators.spread import spread_scan


def test_spread_fans_out_single_partition(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_spread_is_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 2)
    out = spread_scan(df)
    # identity: same object, no extra exchange appended
    assert out is df


def test_spread_preserves_rows_and_schema(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "id long, text string"
    ).coalesce(1)
    out = spread_scan(df)
    assert out.schema == df.schema
    assert sorted(r["id"] for r in out.collect()) == list(range(50))
