"""Equivalence of the explode-aggregate language vote used by the
doc_fingerprints query with the per-row language_guess expression."""

from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.functions.text import (
    doc_fingerprint,
    language_guess,
    token_count,
)
from udacity_dend_capstone_immigration_spark.workload.textops import doc_fingerprints

SF_DIR = "/root/testdata/sf0.001"


def test_explode_agg_language_equals_per_row_expression(spark):
    got = doc_fingerprints(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    want = docs.select(
        "doc_id",
        doc_fingerprint("text").alias("fingerprint"),
        token_count("text").alias("n_tokens"),
        language_guess("text").alias("lang_guess"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_language_guess_edge_values(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat"),          # en
            (2, "el perro es de la casa"),          # es
            (3, "xyzzy qwerty plugh"),              # und (no markers)
            (4, "世界 text the of"),        # zh wins over markers
            (5, ""),                                # empty → und
        ],
        "doc_id long, text string",
    )
    out = dict(df.select("doc_id", language_guess("text")).collect())
    assert out == {1: "en", 2: "es", 3: "und", 4: "zh", 5: "und"}


def test_chunk_boilerplate_stage_gate(spark):
    """r16 stage-gate (r15 window full): the chunk-level boilerplate
    report matches its DuckDB oracle value-for-value at sf0.001, and a
    known injected shared window is found."""
    import duckdb

    from udacity_dend_capstone_immigration_spark.workload.textops import (
        _CHUNK_BOILERPLATE_ORACLE,
        chunk_boilerplate_windows,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, chunk_boilerplate_windows(spark, sf).collect()))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(_CHUNK_BOILERPLATE_ORACLE).fetchall()))
    assert got == want
    assert all(r[1] >= 2 for r in got)


def test_chunk_unique_ratio_stage_gate(spark):
    """r16 stage-gate: the per-doc unique-chunk ratio matches its
    DuckDB oracle value-for-value at sf0.001, covers every non-empty
    doc, and ratios live in [0, 1]."""
    import duckdb

    from udacity_dend_capstone_immigration_spark.workload.textops import (
        _CHUNK_UNIQUE_RATIO_ORACLE,
        doc_unique_chunk_ratio,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, doc_unique_chunk_ratio(spark, sf).collect()))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.sql(_CHUNK_UNIQUE_RATIO_ORACLE).fetchall()))
    assert got == want
    assert all(0.0 <= r[3] <= 1.0 for r in got)
    assert len(got) > 100
