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


def test_arrow_pairs_survive_unoccupied_blocks(spark):
    """With fewer vectors than blocks some crc32 buckets are empty, so a
    (bi, bj) group can hold rows from only one side — the gram kernel
    must return the empty typed frame instead of np.stack-ing nothing
    (r2 advice)."""
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        cosine_pairs_above,
        cosine_pairs_above_arrow,
    )

    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .where(F.col("vec_id") < 3)
    )
    hof = sorted(map(tuple, cosine_pairs_above(emb, "vec_id", -1.0).collect()))
    arrow = sorted(map(tuple, cosine_pairs_above_arrow(emb, "vec_id", -1.0, num_blocks=8).collect()))
    assert len(arrow) == 3  # all C(3,2) pairs at threshold -1
    assert hof == arrow


def test_arrow_knn_rejects_oversized_query_set(spark, monkeypatch):
    """The collect() contract is enforced, not assumed: above the
    documented bound the call fails loudly."""
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.operators import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    monkeypatch.setattr(similarity, "MAX_BROADCAST_QUERY_ROWS", 5)
    with _pytest.raises(ValueError, match="5-row contract"):
        similarity.brute_force_knn_arrow(emb.where(F.col("vec_id") < 10), emb, "vec_id", k=3)
