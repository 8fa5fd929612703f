"""Persist-and-serve ANN index: the faiss train-once/serve-many
contract (r10 verdict "What's missing #1"). The build writes the
trained IVF centroids, PQ codebooks and per-vector codes as tables;
serving reads ONLY those plus the query vectors — these tests pin the
no-training serving plan and the encode→decode == reconstruct
equivalence the shared oracle relies on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.similarity import (
    Codebook,
    pq_decode_codes,
    pq_encode,
    pq_reconstruct,
)
from udacity_dend_capstone_immigration_spark.workload import vectors as V

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(spark):
    return V.served_index_dir(spark, SF_DIR)


def test_build_writes_all_three_relations(spark, index_dir):
    cents = spark.read.parquet(f"{index_dir}/ivf_centroids")
    books = spark.read.parquet(f"{index_dir}/pq_codebooks")
    codes = spark.read.parquet(f"{index_dir}/pq_codes")
    assert set(cents.columns) == {"cent_id", "cent_emb"}
    assert set(books.columns) == {"block", "code", "codeword"}
    assert {"vec_id", "codes", "cell", "cell_pt"} <= set(codes.columns)
    n_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert codes.count() == n_emb
    # cell-partitioned layout on disk: one directory per coarse cell
    cells = [r["cell_pt"] for r in codes.select("cell_pt").distinct().collect()]
    assert len(cells) >= 2
    # data column survives with its exact type (partition inference
    # would have re-typed a partition-only cell column)
    assert dict(codes.dtypes)["cell"] == "bigint"


def test_served_index_dir_caches_per_sf(spark, index_dir):
    assert V.served_index_dir(spark, SF_DIR) == index_dir


def test_encode_decode_equals_reconstruct(spark):
    emb = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(50)
    )
    cbs = V._pq_codebooks(emb)
    direct = {
        r["vec_id"]: r["r"] for r in pq_reconstruct(emb, cbs).collect()
    }
    decoded = {
        r["vec_id"]: r["r"]
        for r in pq_decode_codes(pq_encode(emb, cbs), cbs).collect()
    }
    assert direct == decoded  # bit-exact, not approximate


def test_decode_handles_noncontiguous_code_ids():
    # a training pass that empties a cell drops its id — decode must
    # gather by ID, not by position
    cb = Codebook([(0, [1.0, 0.0]), (5, [0.0, 1.0]), (9, [1.0, 1.0])])
    import numpy as np

    rows = np.searchsorted(cb.ids, np.array([9, 0, 5]))
    assert list(cb.ids[rows]) == [9, 0, 5]


def test_serving_plan_reads_only_index_and_queries(spark, index_dir):
    import contextlib
    import io

    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    import re

    df = QUERIES["knn_ivfpq_served"](spark, SF_DIR)
    # formatted explain: full scan locations (toString truncates paths)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the only corpus-sized work is the codes scan + one Arrow decode
    # (formatted explain lists each node once in the detail section)
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    # no training/encoding shapes: training collects eagerly (never in
    # a plan), and an in-plan corpus encode would show as a second
    # MapInPandas over an embeddings scan; no explode-based centroid
    # aggregation either. The ONLY local relation allowed is the
    # collected probe list (query_id, cell) — bounded at queries ×
    # NPROBE rows by construction; a corpus-sized checkpoint here
    # would be a broken serving plan
    assert "Generate" not in plan
    # the only local relations allowed are the collected probe list
    # (query_id, cell) and — since r17's one-job probe setup — the
    # bounded query-vector side (query_id, q_emb); both are ≤ queries ×
    # NPROBE rows by construction. A corpus-sized checkpoint here would
    # be a broken serving plan.
    rdd_nodes = re.findall(r"\(\d+\) Scan ExistingRDD\n(?:.*\n){1,3}", plan)
    for node in rdd_nodes:
        assert "query_id" in node and ("cell" in node or "q_emb" in node), node
    # r17: the serving plan never scans the embeddings table AT ALL —
    # the query side is the local relation `_served_probe_setup`
    # collected in its one bounded job (pre-r17 the plan re-scanned
    # embeddings.parquet for the vec_id < 10 query side; the centroid
    # relation is a driver-side pyarrow read, also absent).
    assert "embeddings.parquet" not in plan, plan[:2000]
    assert "pq_codes" in plan
    # probe routing happens BEFORE decode: the codes scan carries a
    # static partition filter on cell_pt, so only probed cells are
    # read/decoded (the faiss serving cost model)
    assert re.search(r"PartitionFilters: \[cell_pt#\d+ IN", plan), plan[:2000]


def test_served_equals_inline_ivfpq(spark):
    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    served = {
        tuple(r)
        for r in QUERIES["knn_ivfpq_served"](spark, SF_DIR)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
        .collect()
    }
    inline = {
        tuple(r)
        for r in QUERIES["knn_ivfpq"](spark, SF_DIR)
        .select("query_id", "neighbor_id", "cosine_sim", "rank")
        .collect()
    }
    assert served == inline


def test_build_roundtrip_counts_match_assignment(spark, index_dir):
    codes = spark.read.parquet(f"{index_dir}/pq_codes")
    per_cell = {
        r["cell"]: r["n"]
        for r in codes.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    _, cb = V._ivf_train(emb)
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        assign_nearest_arrow,
    )

    fresh = {
        r["cell"]: r["n"]
        for r in assign_nearest_arrow(emb, cb, "vec_id")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert per_cell == fresh


def test_append_then_serve_includes_new_vectors(spark):
    # faiss `add` semantics: append encodes against the FROZEN
    # codebooks (O(batch), no retraining) and serving picks the rows up
    # with zero plan changes
    import tempfile

    from pyspark.sql import functions as F2

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F2.col("vec_id") % 7 != 0)
    new = emb.where(F2.col("vec_id") % 7 == 0)
    idx = V.build_ivfpq_index(
        spark, SF_DIR, tempfile.mkdtemp(prefix="ivfpq_append_t_"), emb=corpus
    )
    n_corpus = spark.read.parquet(f"{idx}/pq_codes").count()
    V.append_to_ivfpq_index(spark, new, idx)
    codes = spark.read.parquet(f"{idx}/pq_codes")
    assert codes.count() == emb.count()
    assert codes.count() > n_corpus
    # appended rows are queryable: decode them and check the
    # reconstruction matches a direct frozen-codebook encode+decode
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        pq_decode_codes,
    )

    books = V.load_pq_codebooks(spark, f"{idx}/pq_codebooks")
    new_ids = {r["vec_id"] for r in new.select("vec_id").collect()}
    served = pq_decode_codes(
        codes.where(F2.col("vec_id") % 7 == 0).select("vec_id", "codes"), books
    )
    assert {r["vec_id"] for r in served.collect()} == new_ids


def test_flat_serving_plan_is_routed_and_training_free(spark):
    # the IVF-FLAT store: exact scoring, partition-routed, NO Python
    # stage at all in the serving plan (scoring is declarative)
    import contextlib
    import io
    import re

    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    df = QUERIES["knn_ivf_served"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan
    assert "Generate" not in plan
    assert re.search(r"PartitionFilters: \[cell_pt#\d+ IN", plan), plan[:2000]
    for seg in plan.split("Location:"):
        if "embeddings.parquet" in seg.splitlines()[0]:
            assert "LessThan(vec_id,10)" in seg, seg[:400]
    assert "ivf_vectors" in plan


def test_flat_served_equals_inline_ivf(spark):
    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    served = {
        tuple(r)
        for r in QUERIES["knn_ivf_served"](spark, SF_DIR).collect()
    }
    inline = {tuple(r) for r in QUERIES["knn_ivf"](spark, SF_DIR).collect()}
    assert served == inline


def test_flat_append_then_counts_cover_all(spark):
    import tempfile

    from pyspark.sql import functions as F2

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F2.col("vec_id") % 7 != 0)
    new = emb.where(F2.col("vec_id") % 7 == 0)
    idx = V.build_ivf_flat_index(
        spark, SF_DIR, tempfile.mkdtemp(prefix="ivfflat_append_t_"), emb=corpus
    )
    n_corpus = spark.read.parquet(f"{idx}/ivf_vectors").count()
    V.append_to_ivf_flat_index(spark, new, idx)
    store = spark.read.parquet(f"{idx}/ivf_vectors")
    assert store.count() == emb.count() > n_corpus
    # appended rows carry cells the frozen codebook assigns
    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        Codebook,
        assign_nearest_arrow,
    )

    cb = Codebook(
        [
            (r["cent_id"], r["cent_emb"])
            for r in spark.read.parquet(f"{idx}/ivf_centroids").collect()
        ]
    )
    fresh = {
        r["vec_id"]: r["cell"]
        for r in assign_nearest_arrow(new, cb, "vec_id").collect()
    }
    stored = {
        r["vec_id"]: r["cell"]
        for r in store.where(F2.col("vec_id") % 7 == 0)
        .select("vec_id", "cell")
        .collect()
    }
    assert stored == fresh


def test_decode_raises_on_codebook_version_skew(spark):
    # codes referencing an id absent from the loaded codebook must fail
    # loudly (r11 advice) — not gather the insertion-point neighbor
    cbs = [Codebook([(0, [1.0, 0.0]), (5, [0.0, 1.0])])]
    ok = spark.createDataFrame([(1, [0]), (2, [5])], "vec_id long, codes array<long>")
    assert pq_decode_codes(ok, cbs).count() == 2
    skewed = spark.createDataFrame([(1, [3])], "vec_id long, codes array<long>")
    with pytest.raises(Exception, match="version skew"):
        pq_decode_codes(skewed, cbs).collect()


def test_sq8_store_layout_and_roundtrip(spark):
    # the SQ8 store is literally d bytes/vector; decode reproduces the
    # affine reconstruction the int8 audit proved bit-portable
    import numpy as np

    from udacity_dend_capstone_immigration_spark.operators.similarity import (
        sq8_decode_codes,
    )

    idx = V.served_index_dir(spark, SF_DIR, kind="sq8")
    codes = spark.read.parquet(f"{idx}/sq8_codes")
    n_emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert codes.count() == n_emb
    assert dict(codes.dtypes)["codes"] == "binary"
    assert all(
        r["n"] == 64 for r in codes.select(F.length("codes").alias("n")).distinct().collect()
    )
    mn, mx = V.load_sq8_stats(spark, f"{idx}/sq8_stats")
    assert len(mn) == len(mx) == 64
    # bit-exact reconstruction: decode one vector and recompute locally
    row = codes.select("vec_id", "codes").first()
    dec = {
        r["vec_id"]: r["r"]
        for r in sq8_decode_codes(
            codes.where(F.col("vec_id") == row["vec_id"]).select("vec_id", "codes"),
            mn,
            mx,
        ).collect()
    }
    c = np.frombuffer(row["codes"], dtype=np.uint8).astype(np.float64)
    mn_a, mx_a = np.array(mn), np.array(mx)
    expect = mn_a + (c * (mx_a - mn_a)) / 255.0
    assert list(expect) == list(dec[row["vec_id"]])


def test_sq8_serving_plan_is_routed_and_training_free(spark):
    # one Arrow decode stage, stats in closure, probe-routed codes
    # scan, query-side-only embeddings read — the knn_ivfpq_served
    # contract at the SQ8 tier
    import contextlib
    import io
    import re

    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    df = QUERIES["knn_sq8_served"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert "Generate" not in plan
    rdd_nodes = re.findall(r"\(\d+\) Scan ExistingRDD\n(?:.*\n){1,3}", plan)
    for node in rdd_nodes:
        assert "query_id" in node and ("cell" in node or "q_emb" in node), node
    # r17: no embeddings scan anywhere — the query side is the local
    # relation from `_served_probe_setup`'s one bounded job
    assert "embeddings.parquet" not in plan, plan[:2000]
    assert "sq8_codes" in plan
    assert re.search(r"PartitionFilters: \[cell_pt#\d+ IN", plan), plan[:2000]


def test_sq8_append_covers_all_with_frozen_quantizer(spark):
    import tempfile

    from pyspark.sql import functions as F2

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = emb.where(F2.col("vec_id") % 7 != 0)
    new = emb.where(F2.col("vec_id") % 7 == 0)
    idx = V.build_ivf_sq8_index(
        spark, SF_DIR, tempfile.mkdtemp(prefix="ivfsq8_append_t_"), emb=corpus
    )
    n_corpus = spark.read.parquet(f"{idx}/sq8_codes").count()
    V.append_to_sq8_index(spark, new, idx)
    store = spark.read.parquet(f"{idx}/sq8_codes")
    assert store.count() == emb.count() > n_corpus
    # the quantizer is frozen: stats unchanged after append
    mn, mx = V.load_sq8_stats(spark, f"{idx}/sq8_stats")
    assert len(mn) == 64


def test_sq8_stream_append_saturates_against_frozen_stats(spark):
    """Streamed SQ8 appends encode against the FROZEN corpus stats:
    values outside the trained [mn, mx] must saturate to 0/255 (the
    scalar-quantizer append contract), never wrap."""
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F2

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    idx = V.build_ivf_sq8_index(
        spark, SF_DIR, tempfile.mkdtemp(prefix="ivfsq8_sat_t_"), emb=emb
    )
    # an out-of-range batch: scale every coordinate far past the stats
    big = emb.limit(3).select(
        (F2.col("vec_id") + 1_000_000).alias("vec_id"),
        F2.transform(F2.col("embedding"), lambda v: v * F2.lit(100.0))
        .cast("array<float>")
        .alias("embedding"),
    )
    src = tempfile.mkdtemp(prefix="sq8_sat_src_")
    big.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(src)
    V.stream_append_to_sq8_index(
        spark, stream, idx, tempfile.mkdtemp(prefix="ck_sq8_sat_")
    )
    appended = (
        V.read_sq8_store(spark, idx)
        .where(F2.col("vec_id") >= 1_000_000)
        .select("codes")
        .collect()
    )
    assert len(appended) == 3
    for r in appended:
        arr = np.frombuffer(r["codes"], dtype=np.uint8)
        assert arr.min() >= 0 and arr.max() <= 255
        # coordinates blown past the max must pin AT 255 (saturation,
        # not wrap-around — a wrapped byte would be small again)
        assert (arr == 255).sum() > 0


def test_filtered_serving_plan_is_routed_filtered_and_training_free(spark):
    # the attribute-carrying flat store: label predicate must reach the
    # routed store scan as a parquet PushedFilter (pre-filtering), with
    # the same cell_pt routing and no training / Python stage
    import contextlib
    import io
    import re

    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    df = QUERIES["knn_ivf_filtered_served"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "MapInPandas" not in plan
    assert re.search(r"PartitionFilters: \[cell_pt#\d+ IN", plan), plan[:2000]
    store_seg = [
        seg for seg in plan.split("Location:") if "ivf_vectors" in seg.splitlines()[0]
    ]
    assert store_seg, plan[:2000]
    assert "LessThan(label,5)" in store_seg[0], store_seg[0][:600]
    for seg in plan.split("Location:"):
        if "embeddings.parquet" in seg.splitlines()[0]:
            assert "LessThan(vec_id,10)" in seg, seg[:400]


def test_filtered_served_never_returns_filtered_out_labels(spark):
    from udacity_dend_capstone_immigration_spark.workload import QUERIES
    from udacity_dend_capstone_immigration_spark.workload.base import table

    res = QUERIES["knn_ivf_filtered_served"](spark, SF_DIR).collect()
    assert res
    labels = {
        r["vec_id"]: r["label"]
        for r in table(spark, SF_DIR, "embeddings").select("vec_id", "label").collect()
    }
    assert all(labels[r["neighbor_id"]] < 5 for r in res)


def test_centroid_drift_report_flags_shifted_appends(spark, tmp_path):
    """r14 staging gate: the drift report reads ONLY the store, covers
    every cell, starts near the Lloyd fixed point (small drift), and a
    strongly-shifted frozen-codebook append pushes the touched cells'
    drift up — the retrain trigger firing exactly when the O(batch)
    append contract stops being quality-free."""
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.workload.vectors import (
        append_to_ivf_flat_index,
        build_ivf_flat_index,
        centroid_drift_report,
    )

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "drift_idx")
    build_ivf_flat_index(spark, sf, idx)
    before = {r["cell"]: r for r in centroid_drift_report(spark, idx).collect()}
    assert len(before) >= 8  # every (non-empty) cell reported
    assert all(0.0 <= r["drift"] <= 2.0 for r in before.values())

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id", "embedding")
    shifted = emb.limit(200).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: (x * F.lit(-1.0)).cast("float")
        ).alias("embedding"),
    )
    append_to_ivf_flat_index(spark, shifted, idx)
    after = {r["cell"]: r for r in centroid_drift_report(spark, idx).collect()}
    assert max(r["drift"] for r in after.values()) > max(
        r["drift"] for r in before.values()
    )
    assert any(r["retrain_due"] for r in after.values())


def test_served_flat_corpus_excludes_query_stream(spark):
    """kind='flat_corpus' (r16 — the online-serving twin's memoized
    layout) is built on the corpus partition ONLY: no vec_id % 7 == 0
    row may be in the store, or the query stream would probe an index
    that already contains the queries. Also pins the memo hit."""
    d = V.served_index_dir(spark, SF_DIR, kind="flat_corpus")
    vecs = spark.read.parquet(f"{d}/ivf_vectors")
    assert vecs.where("vec_id % 7 = 0").count() == 0
    n_corpus = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where("vec_id % 7 != 0")
        .count()
    )
    assert vecs.count() == n_corpus
    assert V.served_index_dir(spark, SF_DIR, kind="flat_corpus") == d
