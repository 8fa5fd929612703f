"""The Arrow/numpy kNN fast path must produce exactly the HOF path's
results (cosine rounded to 6dp, deterministic tiebreaks)."""

import time

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.similarity import (
    brute_force_knn,
    brute_force_knn_arrow,
)

SF_DIR = "/root/testdata/sf0.001"


def test_arrow_knn_matches_hof_knn(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 10)
    hof = brute_force_knn(queries, emb, "vec_id", k=10)
    arrow = brute_force_knn_arrow(queries, emb, "vec_id", k=10)
    a = sorted(map(tuple, hof.collect()))
    b = sorted(map(tuple, arrow.collect()))
    assert a == b


def test_arrow_knn_handles_more_neighbors_than_rows(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    queries = emb.where(F.col("vec_id") < 2)
    tiny = emb.where(F.col("vec_id") < 5)
    out = brute_force_knn_arrow(queries, tiny, "vec_id", k=10).collect()
    # 2 queries × 4 non-self candidates each
    assert len(out) == 8


def test_arrow_pairs_match_hof_pairs(spark):
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_pairs_above,
        cosine_pairs_above_arrow,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    hof = sorted(map(tuple, cosine_pairs_above(emb, "vec_id", 0.4).collect()))
    arrow = sorted(map(tuple, cosine_pairs_above_arrow(emb, "vec_id", 0.4).collect()))
    assert len(hof) > 0
    assert hof == arrow
