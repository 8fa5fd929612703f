from udacity_dend_capstone_immigration_spark.operators.topk import top_k, top_k_per_group
from udacity_dend_capstone_immigration_spark.operators.asof import asof_join
from udacity_dend_capstone_immigration_spark.operators.skew import salted_join
from udacity_dend_capstone_immigration_spark.operators.multimodal import (
    decode_metadata,
    extract_features,
    resize_media,
    sample_frames,
    set_codec,
)
from udacity_dend_capstone_immigration_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_by_fingerprint,
    minhash_lsh_dedup_pairs,
    minhash_signatures_agg,
    shingle_rows,
    shingle_sets,
    minhash_signature,
    lsh_candidate_pairs,
    jaccard_verified_pairs,
    simhash64,
)
from udacity_dend_capstone_immigration_spark.operators.similarity import (
    brute_force_knn,
    cosine_pairs_above,
    cosine_pairs_above_arrow,
    signbit_lsh_knn,
)
from udacity_dend_capstone_immigration_spark.operators.windows import (
    tumbling_window_agg,
    sliding_window_agg,
    sessionize,
    trailing_range_agg,
)

__all__ = [
    "top_k",
    "top_k_per_group",
    "asof_join",
    "salted_join",
    "decode_metadata",
    "extract_features",
    "resize_media",
    "sample_frames",
    "set_codec",
    "minhash_lsh_dedup_pairs",
    "minhash_signatures_agg",
    "shingle_rows",
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
    "trailing_range_agg",
]
