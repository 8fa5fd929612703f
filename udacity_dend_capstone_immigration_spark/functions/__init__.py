from udacity_dend_capstone_immigration_spark.functions.dates import sas_date_to_date, sas_date_to_iso_string
from udacity_dend_capstone_immigration_spark.functions.cleaning import (
    valid_birth_year,
    port_city,
    port_state_code,
    invalid_country_to_na,
)
from udacity_dend_capstone_immigration_spark.functions.vectors import (
    dot,
    l2_norm,
    cosine_similarity,
)
from udacity_dend_capstone_immigration_spark.functions.text import (
    normalize_text,
    tokenize,
    token_count,
    char_ngrams,
    word_shingles,
    doc_fingerprint,
    quality_features,
    language_guess,
    bpe_ish_token_count,
)

__all__ = [
    "sas_date_to_date",
    "sas_date_to_iso_string",
    "valid_birth_year",
    "port_city",
    "port_state_code",
    "invalid_country_to_na",
    "dot",
    "l2_norm",
    "cosine_similarity",
    "normalize_text",
    "tokenize",
    "token_count",
    "char_ngrams",
    "word_shingles",
    "doc_fingerprint",
    "quality_features",
    "language_guess",
    "bpe_ish_token_count",
]
