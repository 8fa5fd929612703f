"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``udacity_dend_capstone_immigration_spark.workload`` — one registered query per
operator family from SURVEY.md §2 plus the training-data-pipeline tier.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from udacity_dend_capstone_immigration_spark.workload import ORACLES, QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "top_nations_by_orders"

#: The driver's CORRECTNESS record keeps only the first 50 entries of
#: ``queries()``. Round-11 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) the ten queries NEW this round —
#: `knn_ivfpq_served` / `knn_ivfpq_residual_served` /
#: `knn_ivf_served` / `embeddings_stream_knn_served` /
#: `ann_index_build_roundtrip` / `ann_index_append_roundtrip` (the
#: persisted train-once/serve-many index tier: plain-PQ + IVFADC +
#: exact-flat serving, ONLINE streaming serving, build, and
#: frozen-codebook ingest), `bpe_encode_corpus` (the tokenizer
#: train→encode loop closed), and `doc_kn_bigram_likelihood`
#: (Kneser-Ney smoothed LM scoring — the production quality filter),
#: and `dedup_simhash_pairs` / `dedup_simhash_recall` (banded SimHash
#: pair generation + the last missing approximate-tier recall audit);
#: (b) PLAN_CHANGED — the five whose plan, oracle, or constructed
#: result changed this round (NULL-payload quarantine semantics,
#: height-perturbing payload-dedup copies, per-run bucketed table
#: names, the z-checkpoint batch finish, the factored trainer) —
#: results re-proven; (c) the r7 tranche (the oldest official rows;
#: 35 of its 38 fit — `tpch_q19/q21/q22` rotate next round, inside the
#: capacity-derived staleness bound tests/test_registry.py enforces:
#: current round − (⌈N/50⌉ + 1)).
SHOWCASE = [
    # (a) new this round
    "knn_ivfpq_served",
    "knn_ivfpq_residual_served",
    "knn_ivf_served",
    "embeddings_stream_knn_served",
    "ann_index_build_roundtrip",
    "ann_index_append_roundtrip",
    "bpe_encode_corpus",
    "doc_kn_bigram_likelihood",
    "dedup_simhash_pairs",
    "dedup_simhash_recall",
    # (b) plan / oracle / constructed-result changed this round
    "events_json_corrupt_audit",
    "multimodal_payload_dedup",
    "bucketed_join_roundtrip",
    "documents_stream_dedup_status",
    "bpe_train_merges",
    # (c) the r7 tranche (35 of 38 — q19/q21/q22 rotate next round)
    "distinct_counts_per_segment",
    "dedup_exact_rows",
    "table_row_counts",
    "sql_revenue_by_priority",
    "approx_distinct_summary",
    "regional_supplier_revenue",
    "orders_column_profile",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "tpch_q14_promo_effect",
    "lineitem_price_qty_corr",
    "text_quality_scores",
    "token_stats_by_source",
    "dedup_simhash",
    "token_counts_bpe_ish",
    "doc_winnowing_fingerprints",
    "doc_trigram_lm",
    "doc_feature_hashing",
    "doc_chunk_windows",
    "doc_lm_likelihood",
    "source_token_divergence",
    "events_sliding_2h",
    "events_json_extract",
    "events_cep_triples",
    "multimodal_resize",
    "tpch_q4_late_order_priority",
    "tpch_q7_nation_trade_volume",
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation_year",
    "tpch_q10_returned_items",
    "tpch_q12_priority_by_shipcat",
    "tpch_q13_order_count_distribution",
    "tpch_q15_top_supplier",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
]

#: Queries whose plan, oracle, or constructed result changed THIS round
#: (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED = [
    "events_json_corrupt_audit",
    "multimodal_payload_dedup",
    "bucketed_join_roundtrip",
    "documents_stream_dedup_status",
    "bpe_train_merges",
]


def _ordered(mapping: dict) -> dict:
    head = {n: mapping[n] for n in SHOWCASE if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES[FLAGSHIP](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    showcase-tier first (see SHOWCASE)."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return _ordered(ORACLES)
