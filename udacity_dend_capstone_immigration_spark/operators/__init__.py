from udacity_dend_capstone_immigration_spark.operators.topk import top_k, top_k_per_group
from udacity_dend_capstone_immigration_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_by_fingerprint,
    shingle_sets,
    minhash_signature,
    lsh_candidate_pairs,
    jaccard_verified_pairs,
    simhash64,
)
from udacity_dend_capstone_immigration_spark.operators.similarity import (
    brute_force_knn,
    cosine_pairs_above,
    signbit_lsh_knn,
)
from udacity_dend_capstone_immigration_spark.operators.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    sessionize,
)

__all__ = [
    "top_k",
    "top_k_per_group",
    "exact_dedup",
    "exact_dedup_by_fingerprint",
    "shingle_sets",
    "minhash_signature",
    "lsh_candidate_pairs",
    "jaccard_verified_pairs",
    "simhash64",
    "brute_force_knn",
    "cosine_pairs_above",
    "signbit_lsh_knn",
    "tumbling_window_agg",
    "sliding_window_agg",
    "sessionize",
]
