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


def test_probe_estimates_unsplittable_parquet(spark, tmp_path):
    """A one-row-group parquet file must probe as 1 partition via the
    footer path (no df.rdd), and spread_scan must fan it out."""
    from udacity_dend_capstone_immigration_spark.operators.spread import probe_scan_partitions

    p = str(tmp_path / "one")
    spark.range(10000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p).selectExpr("id", "id * 2 AS dbl")
    assert probe_scan_partitions(df) == 1
    out = spread_scan(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 10000


def test_probe_declines_non_file_plans(spark):
    """In-memory plans have no input files; the probe defers to the RDD
    fallback instead of guessing."""
    from udacity_dend_capstone_immigration_spark.operators.spread import probe_scan_partitions

    assert probe_scan_partitions(spark.range(100)) is None


def test_probe_counts_row_groups_across_files(spark, tmp_path):
    """Several small files bin-pack: the estimate is bounded by total
    size / maxPartitionBytes, not the file count."""
    from udacity_dend_capstone_immigration_spark.operators.spread import probe_scan_partitions

    p = str(tmp_path / "many")
    spark.range(1000).repartition(6).write.parquet(p)
    df = spark.read.parquet(p)
    est = probe_scan_partitions(df)
    assert est == 1  # 6 tiny files « 128 MB pack into one split
