"""Z-order write + min/max file skipping: interleave correctness,
losslessness of the skipping scan, and the actual POINT of z-ordering
— a 2-D box must touch fewer files than it would under a single-column
sort layout."""

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.sources.zorder import (
    file_stats,
    interleave_bits,
    scan_with_skipping,
    zorder_write,
)


def _py_morton(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def _grid(spark, n=64):
    rows = [(a * n + b, a, b) for a in range(n) for b in range(n)]
    return spark.createDataFrame(rows, "id long, a long, b long")


def test_interleave_matches_reference(spark):
    df = spark.createDataFrame(
        [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 255)],
        "a long, b long",
    )
    got = df.select("a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z"))
    for r in got.collect():
        assert r["z"] == _py_morton(r["a"], r["b"], 8), (r["a"], r["b"])


def test_skipping_scan_is_lossless(spark, tmp_path):
    df = _grid(spark)
    path = str(tmp_path / "z")
    zorder_write(df, path, ["a", "b"], n_files=16)
    bounds = {"a": (5, 30), "b": (40, 60)}
    got, n_read, n_total = scan_with_skipping(spark, path, bounds)
    expect = {
        tuple(r)
        for r in df.where(
            F.col("a").between(5, 30) & F.col("b").between(40, 60)
        ).collect()
    }
    assert {tuple(r) for r in got.select("id", "a", "b").collect()} == expect
    assert 0 < n_read < n_total == 16


def test_zorder_beats_single_column_sort_for_2d_box(spark, tmp_path):
    df = _grid(spark)
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    zorder_write(df, zpath, ["a", "b"], n_files=16)
    # the comparison layout: perfectly sorted on `a` alone
    (
        df.repartitionByRange(16, F.col("a"))
        .sortWithinPartitions("a")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    bounds = {"a": (16, 31), "b": (16, 31)}  # a quarter-width box on each dim
    _, z_read, z_total = scan_with_skipping(spark, zpath, bounds)
    _, l_read, l_total = scan_with_skipping(spark, lpath, bounds)
    assert z_total == l_total == 16
    # linear layout skips on `a` only (b spans every file); z-order
    # skips on BOTH dimensions
    assert z_read < l_read, (z_read, l_read)


def test_empty_candidate_box_returns_schema_only(spark, tmp_path):
    df = _grid(spark, n=8)
    path = str(tmp_path / "z")
    zorder_write(df, path, ["a", "b"], n_files=4)
    got, n_read, _ = scan_with_skipping(spark, path, {"a": (100, 200)})
    assert n_read == 0
    assert got.count() == 0
    assert set(got.columns) == {"id", "a", "b"}
