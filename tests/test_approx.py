"""approx_count_distinct must stay within its configured error bound —
the sketch path that replaces exact distinct counts at 100 TB."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_within_bound(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        exact = li.select(col).distinct().count()
        approx = li.agg(F.approx_count_distinct(col, 0.02)).first()[0]
        assert abs(approx - exact) / exact < 0.05, (col, exact, approx)
