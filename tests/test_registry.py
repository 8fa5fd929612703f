"""Registry-wide driver-contract guards.

Round-1 postmortem: one query returning ``array<float>`` crashed the
driver's pandas canonicalizer (it sorts every column; list cells are
unhashable) and the sweep aborted, orphaning the 40 queries registered
after it. These tests make that class of failure impossible to
reintroduce:

- every registered query's OUTPUT schema is atomic-only (no array /
  map / struct columns — complex types stay inside queries);
- every registered query has a DuckDB oracle (value-verified, not
  rows-only), so a canonicalizer hiccup on an unoracled query can
  never orphan the sweep tail.
"""

from pyspark.sql.types import ArrayType, MapType, StructType

from udacity_dend_capstone_immigration_spark.workload import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

#: Queries whose construction EXECUTES work (streaming drains, writes,
#: iterative jobs) rather than lazily building a plan. Their schemas are
#: still checked — in the full-gate run (tools/check_oracle.py) — but
#: re-executing them here would double the suite's runtime for no new
#: signal, so the schema walk below skips them and a shape assertion on
#: the registry covers the contract instead.
_EXECUTING = frozenset(
    name
    for name in QUERIES
    if name.startswith("events_stream_")
    or name
    in {
        "embeddings_stream_cell_counts",
        "partitioned_write_roundtrip",
        "dedup_clusters",
        "dedup_keep_best",
        "doc_pagerank_near_dup",
        "immigration_etl_fact",
        "immigration_etl_city_demographics",
    }
)


def _assert_atomic(name, schema):
    for f in schema.fields:
        assert not isinstance(f.dataType, (ArrayType, MapType, StructType)), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — complex output "
            "columns crash the driver canonicalizer (round-1 postmortem); "
            "explode/hash them inside the query"
        )


def test_every_query_has_an_oracle():
    missing = [q for q in QUERIES if q not in ORACLES]
    assert not missing, (
        f"rows-only queries {missing}: add a DuckDB oracle (self-validating "
        "flag pattern if values are engine-specific), or register them last"
    )


def test_all_lazy_query_schemas_are_canonicalizable(spark):
    checked = 0
    for name, fn in QUERIES.items():
        if name in _EXECUTING:
            continue
        _assert_atomic(name, fn(spark, SF_DIR).schema)
        checked += 1
    assert checked >= 70  # the registry didn't silently shrink


def test_executing_query_schemas_are_canonicalizable(spark):
    """The executing set is small enough to run for real at sf0.001."""
    for name in sorted(_EXECUTING):
        _assert_atomic(name, QUERIES[name](spark, SF_DIR).schema)


def test_no_row_at_a_time_python_in_any_lazy_query(spark):
    """Registry-wide ban on BatchEvalPython (row-at-a-time Python UDFs).
    Arrow-vectorized nodes (MapInPandas, FlatMapGroupsInPandas,
    ArrowEvalPython) are the sanctioned Python path; BatchEvalPython in
    ANY query means a hot path silently fell off codegen."""
    import contextlib
    import io

    for name, fn in QUERIES.items():
        if name in _EXECUTING:
            continue
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        assert "BatchEvalPython" not in buf.getvalue(), (
            f"{name} contains a row-at-a-time Python UDF boundary"
        )


def test_showcase_window_completes_official_coverage():
    """The driver records only the first 50 queries() entries per round.
    The round-10 window must (a) be 50 unique registered queries,
    dropping nothing from the registry, (b) contain every query that is
    NEW or whose RESULT SET / PLAN changed this round (the MinHash
    recall audit, the IVF-PQ serving path, the BPE trainer, the
    trailing-frame rewrite; the in-kernel diverse keep policy) so the
    new behavior gets official rows, and (c) keep the closure: every
    registered query has an official row across the prior official
    records ∪ this window."""
    import json
    from pathlib import Path

    import __spark_entry__ as E
    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    q = E.queries()
    assert set(q) == set(QUERIES)
    assert len(E.SHOWCASE) == 50 == len(set(E.SHOWCASE))
    assert all(n in QUERIES for n in E.SHOWCASE)
    first50 = list(q)[:50]
    assert first50 == E.SHOWCASE
    assert list(E.oracle_sql())[:50] == first50

    changed_in_r10 = {
        # new in r10 — must get their first official rows
        "dedup_minhash_recall",
        "knn_ivfpq",
        "ann_ivfpq_recall",
        "bpe_train_merges",
        "events_moving_agg_1h_expiry",
        "bucketed_join_roundtrip",
        "documents_stream_dedup_status",
        "embeddings_stream_dedup_status",
        "embedding_pq_residual_distortion",
        "knn_ivfpq_residual",
        "ann_ivfpq_residual_recall",
        "ann_ivf_nprobe_curve",
        "langid_confusion",
        "approx_quantile_summary",
        "multimodal_payload_dedup",
        "schema_evolution_roundtrip",
        "events_json_corrupt_audit",
        "orc_write_roundtrip",
        "events_salted_dim_join",
        # plan changed in r10 (in-kernel diverse keep policy, shared
        # _distortion_report, factored _register_knn_recall) —
        # results unchanged, re-proven anyway
        "semantic_dedup_diverse_reps",
        "embedding_int8_distortion",
        "embedding_pq_distortion",
        "ann_ivf_recall",
        "ann_lsh_recall",
        "ann_lsh_multitable_recall",
    }
    assert changed_in_r10 <= set(first50)

    root = Path(__file__).resolve().parent.parent
    # r*.json, not r0*.json: from round 10 on, record files have
    # two-digit round numbers and must still count (r8 advice)
    records = sorted(root.glob("CORRECTNESS_r*.json"))
    prior = set()
    for rec in records:
        prior |= set(json.loads(rec.read_text()))
    uncovered = set(QUERIES) - prior - set(first50)
    assert not uncovered, f"queries with no official row in any round: {uncovered}"
    # r10 rotation goal: after this window lands, no query's newest
    # official row may be older than r7
    latest = {}
    for rec in records:
        rnd = int(rec.stem.split("_r")[1])
        for name in json.loads(rec.read_text()):
            latest[name] = max(latest.get(name, 0), rnd)
    for name in first50:
        latest[name] = 10
    too_stale = {n: r for n, r in latest.items() if n in QUERIES and r < 7}
    assert not too_stale, f"official rows older than r7 after this window: {too_stale}"
