"""Stage-gates for the r16-staged chunk-store family (r17 window
candidates): every oracle proven cross-engine at sf0.001 BEFORE
registration, the r14→r15→r16 staging pattern."""

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _oracle_rows(sql):
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con.sql(sql).fetchall()


def test_chunk_store_build_roundtrip_stage_gate(spark):
    from udacity_dend_capstone_immigration_spark.workload.chunkstore import (
        _CHUNK_STORE_BUILD_ORACLE,
        chunk_store_build_roundtrip,
    )

    got = sorted(map(tuple, chunk_store_build_roundtrip(spark, SF).collect()))
    want = sorted(map(tuple, _oracle_rows(_CHUNK_STORE_BUILD_ORACLE)))
    assert got == want
    assert len(got) > 1  # the layout actually fans out across buckets


def test_chunk_store_append_roundtrip_stage_gate(spark):
    """Append ≡ rebuild: the store built on 2/3 + appended 1/3 must
    aggregate exactly like a full-corpus rebuild, per persisted
    bucket."""
    from udacity_dend_capstone_immigration_spark.workload.chunkstore import (
        _CHUNK_STORE_APPEND_ORACLE,
        chunk_store_append_roundtrip,
    )

    got = sorted(map(tuple, chunk_store_append_roundtrip(spark, SF).collect()))
    want = sorted(map(tuple, _oracle_rows(_CHUNK_STORE_APPEND_ORACLE)))
    assert got == want


def test_chunk_boilerplate_served_stage_gate(spark):
    """Serve ≡ inline (shares chunk_boilerplate_windows' oracle), and
    the serve plan is chunk-build-free: a bare store scan feeds the
    aggregate — no Generate (explode) anywhere in the executed plan."""
    from udacity_dend_capstone_immigration_spark.workload.chunkstore import (
        chunk_boilerplate_served,
    )
    from udacity_dend_capstone_immigration_spark.workload.textops import (
        _CHUNK_BOILERPLATE_ORACLE,
    )

    df = chunk_boilerplate_served(spark, SF)
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, _oracle_rows(_CHUNK_BOILERPLATE_ORACLE)))
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, "serve plan re-built chunks"
    assert "chunks" in plan  # reads the persisted relation


def test_chunk_tf_knn_stage_gate(spark):
    """Chunk-grain hashed-TF retrieval matches its DuckDB oracle
    value-for-value (exact-bigint dot/norms, one double division), and
    the result is a well-formed top-k: rn dense 1..k per query chunk,
    cosine within (0, 1] and non-increasing along each ranking."""
    from udacity_dend_capstone_immigration_spark.workload.chunkstore import (
        _CHUNK_TF_KNN_ORACLE,
        _KNN_TOPK,
        chunk_tf_knn,
    )

    out = chunk_tf_knn(spark, SF)
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, _oracle_rows(_CHUNK_TF_KNN_ORACLE)))
    assert got == want
    per_q = {}
    for qid, qidx, cid, cidx, dot, cos, rn in got:
        assert 0.0 < cos <= 1.0 + 1e-12
        assert dot >= 1  # a ranked pair shares at least one bucket
        per_q.setdefault((qid, qidx), []).append((rn, cos))
    for key, rows in per_q.items():
        rows.sort()
        assert [r for r, _ in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _KNN_TOPK
        coses = [c for _, c in rows]
        assert coses == sorted(coses, reverse=True)
