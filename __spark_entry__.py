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
#: ``queries()``. Round-17 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) every PLAN_CHANGED query — the r16
#: optimization round's rewrites escaped driver verification because
#: the r16 window spent everything on rotation debt (VERDICT r16
#: "What's wrong #2"); the r15 clause is restored, so the r16 rewrites
#: AND this round's plan edits all get an official row; (b) as much of
#: the 43-query r11 rotation tranche (oldest official tier) as fits
#: after (a) — plan-changed takes priority per the verdict's item-2
#: wording. The r17 session-2 probe-fold/BPE rewrites added 8 more
#: PLAN_CHANGED rows, so 9 r11-tranche rows (simple profile/aggregate
#: queries, plans untouched for 6 rounds) roll to r18: their r11
#: official rows stay inside the capacity-derived staleness bound
#: (r10), and r18 has free slots per the note below. Two PLAN_CHANGED
#: entries (`embeddings_stream_knn_served`, `bpe_train_merges`) are
#: themselves r11-tranche rows.
#: ROTATION NOTE for r18: after this window the oldest tranche is the
#: 43 r12-row queries plus the 9 r11 rows deferred here; r18's window
#: = its own new/plan-changed set + the 9 r11 deferrals first, then
#: r12 rows.
SHOWCASE = [
    # (a) r16/r17 plan-changed (see PLAN_CHANGED below)
    "corpus_importance_sample",
    "corpus_importance_served",
    "corpus_pipeline_served",
    "corpus_pipeline_streamed",
    "dedup_incremental_status_served",
    "documents_stream_dedup_status",
    "features_pit_served",
    # (a) r17 session-2 rewrites: one-job probe setup (serving plans
    # lost the embeddings scan; probe list + query side now local
    # relations) and the estimate-gated driver-side BPE trainer
    "knn_ivfpq_served",
    "knn_ivf_served",
    "knn_sq8_served",
    "knn_ivf_filtered_served",
    "knn_ivfpq_residual_served",
    "knn_ivf_maintenance_served",
    "embeddings_stream_index_append",
    "bpe_encode_corpus",
    # (b) the r11 rotation tranche minus 9 deferred simple-aggregate
    # rows (includes embeddings_stream_knn_served and bpe_train_merges
    # — both also PLAN_CHANGED)
    "tpch_q3_shipping_priority",
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
    "doc_kn_bigram_likelihood",
    "dedup_simhash_pairs",
    "events_sliding_2h",
    "events_json_extract",
    "events_json_corrupt_audit",
    "events_cep_triples",
    "ann_index_build_roundtrip",
    "ann_index_append_roundtrip",
    "multimodal_resize",
    "multimodal_payload_dedup",
    "embeddings_stream_knn_served",
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
    "bpe_train_merges",
]

#: Queries whose plan, oracle, or constructed result changed in r16 or
#: r17 (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED: list[str] = [
    # r16 rewrites that escaped the r16 window (VERDICT r16 item 2):
    # the _dsir_scores single-pass (4 consumers), the classify
    # union-agg finish, the two serve memos, the streamed twins.
    "corpus_importance_sample",
    "corpus_importance_served",
    "corpus_pipeline_served",
    "corpus_pipeline_streamed",
    "dedup_incremental_status_served",
    "documents_stream_dedup_status",
    "features_pit_served",
    "embeddings_stream_knn_served",
    # r17 session-2: one-job probe setup (serving plans scan only the
    # routed store; probe list + query side local) — every persisted-
    # serve path — and the estimate-gated driver-side BPE trainer.
    "knn_ivfpq_served",
    "knn_ivf_served",
    "knn_sq8_served",
    "knn_ivf_filtered_served",
    "knn_ivfpq_residual_served",
    "knn_ivf_maintenance_served",
    "embeddings_stream_index_append",
    "bpe_encode_corpus",
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
