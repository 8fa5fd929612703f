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
#: ``queries()``. Round-16 window, built by the ROLLING rotation rule
#: (tests/test_registry.py): (a) every query NEW this round — the
#: three r15-staged registrations (`sq8_reindex_roundtrip`: reindex ≡
#: rebuild for the compressed layout, completing the maintenance story
#: the flat retrain defers; `chunk_boilerplate_windows` +
#: `doc_unique_chunk_ratio`: the chunk-grain boilerplate report and
#: the per-doc novelty signal it induces) plus
#: `quality_funnel_chunk_novelty` (the chunk tier composed into the
#: quality cascade — the VERDICT-r15 composition ask); (b) the ENTIRE
#: 45-query r10 rotation tranche (oldest official tier, due by r18 —
#: cleared whole per the r15 verdict's window math); (c) one spare
#: slot spent on `bpe_encode_corpus` from the 44-query r11 tier (a
#: bench headliner — head start on r17's debt). 4 + 45 + 1 = 50.
#: ROTATION NOTE for r17: after this window the oldest tranche is the
#: remaining 43 r11-row queries (`ann_index_append_roundtrip`,
#: `dedup_simhash`, the TPC-H q3-q18 family, etc.), due by r18's
#: window under the capacity-derived cycle — r17 must carry ALL 43
#: alongside its new registrations (43 + 7 free slots ≤ 50: fits).
SHOWCASE = [
    # (a) new this round
    "sq8_reindex_roundtrip",
    "chunk_boilerplate_windows",
    "doc_unique_chunk_ratio",
    "quality_funnel_chunk_novelty",
    # (b) the full r10 rotation tranche, cleared
    "ann_ivf_nprobe_curve",
    "ann_ivf_recall",
    "ann_ivfpq_recall",
    "ann_ivfpq_residual_recall",
    "ann_lsh_multitable_recall",
    "ann_lsh_recall",
    "approx_quantile_summary",
    "birth_year_validation",
    "customers_without_orders",
    "dedup_minhash_recall",
    "embedding_int8_distortion",
    "embedding_near_dup",
    "embedding_pq_distortion",
    "embedding_pq_residual_distortion",
    "embeddings_stream_dedup_status",
    "events_moving_agg_1h_expiry",
    "events_salted_dim_join",
    "events_stream_click_attribution",
    "events_stream_dedup",
    "events_stream_enriched",
    "events_stream_hourly",
    "events_stream_sessions",
    "events_stream_sink_roundtrip",
    "events_stream_sliding",
    "events_stream_stateful_totals",
    "events_stream_transitions",
    "filter_sql_predicate",
    "immigration_etl_city_demographics",
    "immigration_etl_fact",
    "invalid_label_to_na",
    "knn_brute_force",
    "knn_brute_force_arrow",
    "knn_ivfpq",
    "knn_ivfpq_residual",
    "langid_confusion",
    "multimodal_decode",
    "orc_write_roundtrip",
    "partitioned_write_roundtrip",
    "port_name_split",
    "regex_clean_types",
    "sas_date_convert",
    "schema_evolution_roundtrip",
    "semantic_dedup_diverse_reps",
    "top_nations_building_segment",
    "top_parts_by_quantity",
    # (c) r11-tier head start
    "bpe_encode_corpus",
]

#: Queries whose plan, oracle, or constructed result changed THIS round
#: (beyond brand-new ones, which tests/test_registry.py derives as
#: "registered but no official row yet"). The rolling rotation test
#: asserts these sit inside the window so changed behavior always gets
#: an official row the round it ships. Update per round.
PLAN_CHANGED: list[str] = [
    # r16: none — the only plan edits this round are on the four NEW
    # queries (merge hints landed before their first registration),
    # which the rotation test already forces into the window as "no
    # official row yet".
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
