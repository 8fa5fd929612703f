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
#: ``queries()``. Round-12 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) every query NEW this round, in two
#: waves — wave 1 (the r11 verdict items): the persisted IVF-SQ8
#: serving layout + recall audit, ANN store maintenance lifecycle,
#: streaming ingest → exactly-once delta append → serve (both
#: layouts), write-audit-publish, DSIR importance selection,
#: maintenance-aware serve identity, count-min heavy hitters (batch +
#: streaming), DPP; wave 2 (production-lake + retrieval tier):
#: Matryoshka truncation audit, hybrid BM25+dense RRF retrieval,
#: metadata-filtered ANN serving, MERGE upsert + CDC apply, publish
#: time travel, runtime bloom-filter pruning, per-entity OLS trend,
#: z-order file skipping, streaming incremental view maintenance,
#: state-store introspection, per-source quality calibration,
#: triangle cohesion, streaming HLL distinct, entity resolution,
#: deterministic epoch shuffle, partition-layout evolution, and the
#: measured watermark late-data semantics audit; (b) PLAN_CHANGED —
#: the serving-internals changes (PQ-decode version-skew guard,
#: corpus-fingerprinted index cache, bucketed lazy table cleanup) plus
#: `dedup_simhash_recall` (now also emits pair_precision) —
#: results re-proven; (c) the three r7 leftovers (`tpch_q19/q21/q22`)
#: plus the 2 oldest r8 rows (every remaining r8 row rotates r13,
#: inside the capacity-derived staleness bound
#: tests/test_registry.py enforces: current round − (⌈N/50⌉ + 1)).
SHOWCASE = [
    # (a) new this round
    "knn_sq8_served",
    "ann_sq8_recall",
    "ann_index_maintenance_roundtrip",
    "embeddings_stream_index_append",
    "atomic_publish_roundtrip",
    "corpus_importance_sample",
    "knn_ivf_maintenance_served",
    "events_heavy_hitters_cms",
    "events_dpp_partitioned_join",
    "events_stream_heavy_hitters",
    "embeddings_stream_sq8_append",
    "knn_matryoshka16",
    "ann_matryoshka_recall",
    "retrieval_hybrid_rrf",
    "knn_ivf_filtered_served",
    "merge_upsert_roundtrip",
    "publish_time_travel",
    "lineitem_bloom_pruned_join",
    "events_user_linear_trend",
    "events_zorder_box_scan",
    "cdc_apply_roundtrip",
    "events_stream_incremental_agg",
    "events_stream_state_introspection",
    "quality_score_calibration",
    "dedup_triangle_cohesion",
    "events_stream_approx_distinct",
    "entity_resolution_parts",
    "corpus_epoch_shuffle",
    "events_partition_evolution_scan",
    "events_stream_late_data_audit",
    "events_multitouch_attribution",
    "dq_constraint_report",
    "events_stream_outer_attribution",
    "events_time_weighted_avg",
    "events_ohlc_bars",
    "events_approx_top_k_users",
    "events_dynamic_gap_sessions",
    "events_wow_growth",
    "source_dup_rate_report",
    "orders_stream_cdc_apply",
    # (b) plan / serving internals changed this round
    "dedup_simhash_recall",
    "knn_ivfpq_served",
    "knn_ivfpq_residual_served",
    "knn_ivf_served",
    "bucketed_join_roundtrip",
    # (c) the r7 leftovers, then the 2 oldest r8 rows
    "tpch_q19_bracketed_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_idle_customer_balance",
    "knn_lsh_bucketed",
    "label_centroids",
]

#: Queries whose plan, oracle, or constructed result changed THIS round
#: (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED = [
    "dedup_simhash_recall",
    "knn_ivfpq_served",
    "knn_ivfpq_residual_served",
    "knn_ivf_served",
    "bucketed_join_roundtrip",
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
