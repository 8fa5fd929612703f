"""Similarity-search queries over ``embeddings`` (array<float>, dim 64).

Brute-force cosine top-k is the correctness baseline; sign-bit LSH is the
bucketed scale path. All arithmetic is cast to double per-element and
similarities are rounded to 6 decimals before ranking so Spark's
sequential fold and DuckDB's list_sum agree bit-for-bit after rounding
and rank ties break deterministically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.similarity import (
    brute_force_knn,
    cosine_pairs_above,
    signbit_lsh_knn,
)
from udacity_dend_capstone_immigration_spark.workload.base import query, table

#: DuckDB fragment: normalized double vectors + norms.
_NORMED = """
    SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
    FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings)
"""

_COS = "round(list_sum(list_transform(generate_series(1, 64), i -> q.v[i] * c.v[i])) / (q.nrm * c.nrm), 6)"


# --- exact kNN: top-10 cosine neighbors for query vectors vec_id < 10.
@query(
    "knn_brute_force",
    oracle=f"""
    WITH n AS ({_NORMED}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine_sim
        FROM n q JOIN n c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 10
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 10
    """,
)
def knn_brute_force(spark, sf_dir):
    """Query side is tiny → broadcast; the scan over the corpus is one
    map stage with a per-partition top-k heap. Linear in corpus size."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10).select("vec_id", "embedding")
    return brute_force_knn(queries, emb.select("vec_id", "embedding"), "vec_id", k=10)


# --- embedding near-dup: all pairs with cosine >= 0.4.
@query(
    "embedding_near_dup",
    oracle=f"""
    WITH n AS ({_NORMED})
    SELECT q.vec_id AS id_a, c.vec_id AS id_b, {_COS} AS cosine_sim
    FROM n q JOIN n c ON q.vec_id < c.vec_id
    WHERE {_COS} >= 0.4
    """,
)
def embedding_near_dup(spark, sf_dir):
    """O(n²) by definition — bounded here; at scale feed LSH buckets."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return cosine_pairs_above(emb, "vec_id", threshold=0.4)


# --- sign-bit LSH kNN: bucket on the signs of the first 8 coords, rank
# within bucket. The approximate/scale path; oracle replicates the same
# bucketing so results match exactly.
@query(
    "knn_lsh_bucketed",
    oracle=f"""
    WITH n AS ({_NORMED}),
    coded AS (
        SELECT vec_id, v, nrm,
               array_to_string(list_transform(list_slice(v, 1, 8),
                   x -> CASE WHEN x > 0 THEN '1' ELSE '0' END), '') AS bucket
        FROM n
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine_sim
        FROM coded q JOIN coded c
            ON q.bucket = c.bucket AND q.vec_id != c.vec_id
    )
    SELECT query_id, neighbor_id, cosine_sim, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cosine_sim DESC, neighbor_id ASC) AS INT) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def knn_lsh_bucketed(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return signbit_lsh_knn(emb, "vec_id", k=5, num_bits=8)
