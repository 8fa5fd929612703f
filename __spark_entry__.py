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
#: ``queries()``. Round-14 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) every query NEW this round — the four
#: r13-staged registrations (randomized-response release audit,
#: k-anonymity release, deterministic k-fold, centroid-drift retrain
#: report) plus the end-to-end store-served pipeline composition
#: (dedup-store classify → DSIR select → BPE encode+pack, the r13
#: verdict's item 7); (b) the ENTIRE r8 rotation debt — exactly the 45
#: queries named by the r13 plan, whose newest official row was r8.
#: 45 + 5 = 50: the window clears the debt in full (the staleness
#: bound would not have forced it until r16), leaving no registered
#: query with an official row older than r9 after this round.
#: ROTATION NOTE for r15: the oldest tranche will then be the 50-query
#: r9 window; with N≈275 the bound (cycle = ceil(N/50)+1 = 7) reaches
#: r9 at r17, so r15/r16 have two rounds of slack to rotate it while
#: absorbing new registrations (corpus_kfold_cluster_safe is staged
#: first in line).
SHOWCASE = [
    # (a) new this round: the staged four + the pipeline capstone
    "events_randomized_response",
    "events_k_anonymity_release",
    "corpus_kfold_assignment",
    "ann_centroid_drift_report",
    "corpus_pipeline_served",
    # (b) the full r8 rotation debt, cleared
    "approx_quantile_accuracy",
    "asof_purchase_to_click",
    "asof_purchase_to_click_30m",
    "benchmark_contamination",
    "bm25_scores",
    "bpe_merge_candidates",
    "centroid_classifier_confusion",
    "corpus_curation_pipeline",
    "corpus_nucleus_sample",
    "corpus_quota_sample",
    "corpus_stratified_sample",
    "corpus_token_packing",
    "corpus_train_test_split",
    "corpus_weighted_sample",
    "cube_order_summary",
    "customer_spend_quartiles",
    "customers_with_orders_semi",
    "doc_tfidf_top_terms",
    "doc_top_terms",
    "events_cohort_retention",
    "events_equi_depth_histogram",
    "events_hourly_gap_fill",
    "events_latest_per_key",
    "events_robust_stats",
    "events_salted_type_totals",
    "events_scd2_intervals",
    "fuzzy_part_name_pairs",
    "grouping_sets_revenue",
    "lineitem_price_rank_stats",
    "lineitem_rollup",
    "multimodal_features",
    "multimodal_frame_sample",
    "nation_balance_full_outer",
    "negative_sampling_pairs",
    "order_quantity_vectors",
    "orders_above_avg_price",
    "orders_above_customer_avg",
    "orders_metrics_unpivot",
    "quality_filter_funnel",
    "range_join_event_counts",
    "region_priority_grid",
    "set_ops_bag_semantics",
    "set_ops_customer_keys",
    "source_temperature_mixture",
    "value_percentiles_by_type",
]

#: Queries whose plan, oracle, or constructed result changed THIS round
#: (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED = [
    # r14 shipped refactors, not plan changes: the shadowed duplicate
    # mmr/hard-negative definitions were deleted (retrieval_mmr_diverse
    # / retrieval_hard_negatives keep identical op sequences and were
    # re-proven against their oracles at sf0.01 this round), and
    # dedup_incremental_status_served's classify body moved verbatim
    # into classify_batch_against_index (same plan, re-proven). Nothing
    # registered changed plan, oracle, or constructed result.
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
