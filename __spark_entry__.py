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
#: ``queries()``. This round-8 window drives the official record
#: current (round-7 verdict item 2: 56 queries' newest official row
#: was r4/r5 vintage): (a) the 5 queries NEW this round (BM25, BPE
#: merge candidates, negative sampling, SemDeDup-style semantic dedup,
#: temperature source mixing — no official row yet); (b) the
#: 4 queries whose RESULTS or PLANS change this round — knn_ivf /
#: ann_ivf_recall (second Lloyd pass + 16/4 cell layout changes
#: neighbor sets), corpus_token_packing (adaptive cumsum shape) and
#: doc_tfidf_top_terms (single-tokenize df branch; results identical,
#: re-proven anyway); (c) ALL 15 queries whose newest official row is
#: r4 (multimodal features/frame_sample, curation split/weighted/
#: contamination/pipeline, asof, salted totals, equi-depth histogram,
#: quartiles, cohort retention, top-terms, SCD2, gap-fill,
#: latest-per-key); (d) 26 of the 41 r5-recorded queries. The 15 left
#: at r5 are all from the 18-member events tier whose siblings ARE in
#: this window — rotate them in r9. Nothing is dropped — the remaining
#: queries follow in registration order and stay green in the full
#: local gate.
SHOWCASE = [
    # NEW this round — no official row yet
    "bm25_scores",
    "bpe_merge_candidates",
    "negative_sampling_pairs",
    "semantic_dedup_representatives",
    "source_temperature_mixture",
    # results/plans changed this round — re-prove officially
    "knn_ivf",
    "ann_ivf_recall",
    "corpus_token_packing",
    "doc_tfidf_top_terms",
    # stalest tier — newest official row r4
    "multimodal_frame_sample",
    "multimodal_features",
    "corpus_train_test_split",
    "corpus_weighted_sample",
    "benchmark_contamination",
    "corpus_curation_pipeline",
    "asof_purchase_to_click",
    "events_salted_type_totals",
    "events_equi_depth_histogram",
    "customer_spend_quartiles",
    "events_cohort_retention",
    "doc_top_terms",
    "events_scd2_intervals",
    "events_hourly_gap_fill",
    "events_latest_per_key",
    # r5 tier (26 of 41)
    "corpus_nucleus_sample",
    "corpus_quota_sample",
    "corpus_stratified_sample",
    "quality_filter_funnel",
    "knn_lsh_bucketed",
    "label_centroids",
    "centroid_classifier_confusion",
    "order_quantity_vectors",
    "lineitem_rollup",
    "value_percentiles_by_type",
    "set_ops_customer_keys",
    "set_ops_bag_semantics",
    "cube_order_summary",
    "grouping_sets_revenue",
    "customers_with_orders_semi",
    "orders_above_avg_price",
    "orders_above_customer_avg",
    "orders_metrics_unpivot",
    "nation_balance_full_outer",
    "lineitem_price_rank_stats",
    "region_priority_grid",
    "approx_quantile_accuracy",
    "fuzzy_part_name_pairs",
    "range_join_event_counts",
    "asof_purchase_to_click_30m",
    "events_robust_stats",
    # left at r5 (rotate in r9): events_daily_pivot, events_props_variant,
    # events_json_schema, events_lag_gaps, events_rolling_wau,
    # events_moving_agg_1h, events_transition_matrix,
    # events_running_drawdown, events_hourly_anomaly_ratio,
    # events_value_histogram, events_user_running_total,
    # events_props_redaction, events_session_bounce_rate,
    # events_native_session_window, events_funnel_stages
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
