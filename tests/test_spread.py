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


def test_probe_matches_spark_for_many_small_files(spark, tmp_path):
    """Several small files do NOT pack into one split: Spark charges
    openCostInBytes (default 4 MiB) per chunk while packing, so each
    tiny file lands in its own partition. The probe must agree with the
    actual scan (the old total/maxPartitionBytes estimate said 1 here,
    making spread_scan insert a useless exchange on such layouts)."""
    from udacity_dend_capstone_immigration_spark.operators.spread import (
        probe_scan_partitions,
        spread_scan,
    )

    p = str(tmp_path / "many")
    spark.range(1000).repartition(6).write.parquet(p)
    df = spark.read.parquet(p)
    actual = df.rdd.getNumPartitions()
    # exact agreement with the real scan, and definitely not the old
    # single-split estimate (6 tiny files + 4 MiB open cost per chunk
    # pack into several partitions, bytesPerCore-sliced by parallelism)
    assert probe_scan_partitions(df) == actual > 1
    if actual >= spark.sparkContext.defaultParallelism:
        assert spread_scan(df) is df  # no-op on already-parallel layouts


def test_probe_row_group_bound_caps_byte_slicing(spark, tmp_path):
    """Byte-range slicing cannot create data-bearing splits beyond the
    row-group count: a single-row-group file probes as 1 even when a
    tiny maxPartitionBytes would slice it into many byte ranges (the
    extra ranges hold no row-group midpoint — they scan nothing)."""
    from udacity_dend_capstone_immigration_spark.operators.spread import probe_scan_partitions

    p = str(tmp_path / "one")
    spark.range(200_000).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536b")
        assert probe_scan_partitions(df) == 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
