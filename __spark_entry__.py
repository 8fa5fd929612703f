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
#: ``queries()``. Round-15 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) every query NEW this round — the two
#: r14-staged registrations (cluster-safe k-fold, the streaming
#: pipeline twin) plus `ann_retrain_roundtrip` (the drift trigger's
#: ACTION, now oracle-proven retrain ≡ rebuild); (b) the two
#: PLAN_CHANGED queries (features_pit_served serves through the
#: retention-floor gate; retrieval_hybrid_rrf's dense arm moved to the
#: Arrow kernel), plus `feature_store_prune_roundtrip` (the retention
#: fold's official row), `events_l_diversity_release` (the
#: homogeneity-attack fix beside the k-anonymity release), and
#: `doc_chunking` (overlapping token-window RAG chunking, zero-shuffle
#: map pass); (c) the ENTIRE 42-query r9 rotation debt (newest
#: official row r9 — the bound would not force it until r17, cleared
#: early). 6 + 2 + 42 = 50.
#: ROTATION NOTE for r16: after this window the oldest tranche is the
#: remaining 42 r10-row queries (due by r18's window) — r16 should
#: carry as much of it as new registrations allow.
SHOWCASE = [
    # (a) new this round
    "corpus_kfold_cluster_safe",
    "corpus_pipeline_streamed",
    "ann_retrain_roundtrip",
    "feature_store_prune_roundtrip",
    "events_l_diversity_release",
    "doc_chunking",
    # (b) plan-changed this round
    "features_pit_served",
    "retrieval_hybrid_rrf",
    # (c) the full r9 rotation debt, cleared
    "top_nations_by_orders",
    "fact_denormalize",
    "pricing_summary",
    "case_insensitive_join",
    "cross_type_join",
    "top_customers_per_nation",
    "dq_referential_summary",
    "doc_fingerprints",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_winnowing_overlap",
    "events_hourly_by_type",
    "events_sessionize",
    "events_daily_pivot",
    "events_user_running_total",
    "knn_ivf",
    "doc_repetition_scores",
    "dedup_substring_runs",
    "doc_pagerank_near_dup",
    "dedup_prefix_filter_jaccard",
    "events_props_redaction",
    "events_session_bounce_rate",
    "events_native_session_window",
    "events_props_variant",
    "events_json_schema",
    "events_lag_gaps",
    "events_funnel_stages",
    "events_rolling_wau",
    "events_moving_agg_1h",
    "events_transition_matrix",
    "events_running_drawdown",
    "events_hourly_anomaly_ratio",
    "events_value_histogram",
    "semantic_dedup_representatives",
    "semantic_dedup_recall",
    "semantic_dedup_cell_profile",
    "dedup_edit_distance",
    "dedup_incremental_status",
    "embeddings_stream_cell_counts",
    "knn_lsh_multitable",
    "dedup_shingle_containment",
]

#: Queries whose plan, oracle, or constructed result changed THIS round
#: (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED = [
    # r15: serve path now routes through read_feature_snapshots with
    # the label frame's bounded min as-of day (retention-floor gate;
    # same result, one extra eager one-row decision)
    "features_pit_served",
    # r15: dense arm swapped from the interpreted-HOF brute_force_knn
    # to brute_force_knn_arrow (result-identical kernels; in-suite
    # 1.41 → 1.18s, clearing the r14 driver flag)
    "retrieval_hybrid_rrf",
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
