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
#: ``queries()``. This round-9 window finishes the record rotation the
#: r7/r8 verdicts scheduled: (a) the queries NEW this round
#: (`semantic_dedup_recall` — the SemDeDup pair-recall audit — and
#: `semantic_dedup_cell_profile` — the cap-machinery audit) plus
#: `semantic_dedup_representatives`, whose PLAN changed this round
#: (checkpointed single assignment, skew-capped md5 sub-buckets,
#: Arrow per-cell gram scoring with in-kernel connected components)
#: plus `knn_ivf` / `ann_ivf_recall` (Arrow codebook
#: training/assignment replaces the crossJoin⋈max_by shape) — results
#: unchanged at these SFs, re-proven anyway; (b) ALL 15 queries whose
#: newest official row is r5 (the events-tier tranche the r8 window
#: deferred); (c) 20 of the 36 r6-recorded queries (plus the ten
#: queries NEW this round: `dedup_edit_distance`,
#: `dedup_incremental_status`, `semantic_dedup_diverse_reps`,
#: `embeddings_stream_cell_counts`, `ann_lsh_recall`,
#: `knn_lsh_multitable`, `ann_lsh_multitable_recall`,
#: `embedding_int8_distortion`, `embedding_pq_distortion`,
#: `dedup_shingle_containment`). The 16 left at r6
#: (`immigration_etl_fact`, `immigration_etl_city_demographics`,
#: `partitioned_write_roundtrip`, `events_stream_sink_roundtrip`,
#: `events_stream_transitions`, `events_stream_click_attribution`,
#: `events_stream_enriched`, `events_stream_dedup`,
#: `events_stream_stateful_totals`, `events_stream_sliding`,
#: `events_stream_hourly`, `events_stream_sessions`,
#: `multimodal_decode`, `knn_brute_force_arrow`, `knn_brute_force`,
#: `embedding_near_dup`) rotate in r10; nothing afterwards is older
#: than r6. Nothing is dropped — the remaining queries follow in
#: registration order and stay green in the full local gate.
SHOWCASE = [
    # NEW / plan-changed this round — prove first (the IVF tier moved
    # to Arrow codebook training/assignment; results unchanged)
    "semantic_dedup_recall",
    "semantic_dedup_cell_profile",
    "dedup_edit_distance",
    "dedup_incremental_status",
    "semantic_dedup_diverse_reps",
    "embeddings_stream_cell_counts",
    "semantic_dedup_representatives",
    "knn_ivf",
    "ann_ivf_recall",
    "ann_lsh_recall",
    "knn_lsh_multitable",
    "ann_lsh_multitable_recall",
    "embedding_int8_distortion",
    "embedding_pq_distortion",
    "dedup_shingle_containment",
    # r5-stale events tranche (deferred by the r8 window)
    "events_daily_pivot",
    "events_props_variant",
    "events_json_schema",
    "events_lag_gaps",
    "events_rolling_wau",
    "events_moving_agg_1h",
    "events_transition_matrix",
    "events_running_drawdown",
    "events_hourly_anomaly_ratio",
    "events_value_histogram",
    "events_user_running_total",
    "events_props_redaction",
    "events_session_bounce_rate",
    "events_native_session_window",
    "events_funnel_stages",
    # r6 tier (20 of 36)
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
    "dedup_clusters",
    "dedup_winnowing_overlap",
    "doc_repetition_scores",
    "dedup_substring_runs",
    "dedup_keep_best",
    "doc_pagerank_near_dup",
    "dedup_prefix_filter_jaccard",
    "events_hourly_by_type",
    "events_sessionize",
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
