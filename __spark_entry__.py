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
#: ``queries()``. Round-13 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) every query NEW this round — sessions
#: 1/2 shipped the persisted text-dedup index + cluster-store
#: lifecycles, BPE store + packed examples, DSIR serve twin, perceptron
#: classifier, SCD2 (batch + stream + invariants), the five remaining
#: TPC-H shapes, and the split-leakage pair; session 3 adds the
#: lifecycle/feature tier (snapshot version diff, k-anonymity audit,
#: PIT feature assembly, MMR rerank, silhouette audit, hard-negative
#: mining, feature store build/append/serve + its streaming twin) —
#: those ten displaced the remaining r8 tranche entirely; (b)
#: PLAN_CHANGED (see below). ROTATION DEBT for r14 (measured at s3
#: close): exactly 45 queries whose newest official row is r8 —
#: approx_quantile_accuracy, asof_purchase_to_click(+_30m),
#: benchmark_contamination, bm25_scores, bpe_merge_candidates,
#: centroid_classifier_confusion, corpus_{curation_pipeline, nucleus/
#: quota/stratified/weighted_sample, token_packing, train_test_split},
#: cube_order_summary, customer_spend_quartiles,
#: customers_with_orders_semi, doc_{tfidf_top_terms, top_terms},
#: events_{cohort_retention, equi_depth_histogram, hourly_gap_fill,
#: latest_per_key, robust_stats, salted_type_totals, scd2_intervals},
#: fuzzy_part_name_pairs, grouping_sets_revenue, lineitem_{price_rank_
#: stats, rollup}, multimodal_{features, frame_sample},
#: nation_balance_full_outer, negative_sampling_pairs,
#: order_quantity_vectors, orders_{above_avg_price,
#: above_customer_avg, metrics_unpivot}, quality_filter_funnel,
#: range_join_event_counts, region_priority_grid, set_ops_{bag_
#: semantics, customer_keys}, source_temperature_mixture,
#: value_percentiles_by_type. The r14 window (~46 slots after the four
#: staged registrations: events_randomized_response,
#: events_k_anonymity_release, corpus_kfold_assignment,
#: ann_centroid_drift_report) fits ALL of them — rotate the lot; with
#: N≈274 the staleness bound reaches r8 at r16, so r14 clears the
#: debt a round early.
SHOWCASE = [
    # (a) new this round
    # session 3: the lifecycle/feature tier — CDF-style snapshot diff
    # over the WAP store, k-anonymity/l-diversity privacy audit, and
    # leakage-free point-in-time feature assembly
    "publish_version_diff",
    "events_k_anonymity_audit",
    "events_pit_feature_assembly",
    "retrieval_mmr_diverse",
    "ann_silhouette_audit",
    "retrieval_hard_negatives",
    "feature_store_build_roundtrip",
    "features_pit_served",
    "feature_store_append_roundtrip",
    "events_stream_feature_updates",
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier_volume",
    "tpch_q11_important_part_value",
    "tpch_q16_supplier_relationship",
    "tpch_q20_part_promotion_suppliers",
    "corpus_split_leakage_audit",
    "corpus_split_cluster_safe",
    "dedup_clusters_incremental",
    "dedup_clusters_delete",
    "cluster_store_build_roundtrip",
    "cluster_store_delete_served",
    "cluster_store_append_served",
    "dedup_index_build_roundtrip",
    "dedup_index_append_roundtrip",
    "dedup_index_fold_roundtrip",
    "dedup_index_delete_roundtrip",
    "dedup_index_revive_roundtrip",
    "documents_stream_index_append",
    "corpus_examples_packed",
    "corpus_examples_packed_served",
    "bpe_encode_served",
    "bpe_encode_incremental",
    "bpe_fertility_report",
    "corpus_importance_served",
    "quality_perceptron_train",
    "quality_perceptron_eval",
    "scd2_merge_roundtrip",
    "dedup_incremental_status_served",
    "ann_sq8_mrr",
    "dim_stream_scd2_apply",
    "scd2_store_invariants",
    # (b) plan changed this round
    "dedup_clusters",
    "dedup_keep_best",
    "entity_resolution_parts",
    "documents_stream_dedup_status",
    "dedup_triangle_cohesion",
    "ann_index_maintenance_roundtrip",
    "merge_upsert_roundtrip",
    "cdc_apply_roundtrip",
    "orders_stream_cdc_apply",
]

#: Queries whose plan, oracle, or constructed result changed THIS round
#: (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED = [
    # session 2: the text-dedup store's fingerprint relation now carries
    # cid (per-doc rows — what makes document DELETES exact) and every
    # read path anti-joins doc tombstones; all store roundtrips and
    # served twins re-prove under the new layout.
    "dedup_index_build_roundtrip",
    "dedup_index_append_roundtrip",
    "dedup_index_fold_roundtrip",
    "documents_stream_index_append",
    "dedup_incremental_status_served",
    # session 2: connected_components' return join now merge-hints its
    # checkpoint-backed label side (estimate-blind static-broadcast fix)
    # — every CC-backed query's plan changed; values identical.
    "dedup_clusters",
    "dedup_keep_best",
    "entity_resolution_parts",
    "documents_stream_dedup_status",
    "dedup_triangle_cohesion",
    "ann_index_maintenance_roundtrip",
    "merge_upsert_roundtrip",
    "cdc_apply_roundtrip",
    "orders_stream_cdc_apply",
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
