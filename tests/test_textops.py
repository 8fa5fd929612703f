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


def test_dsir_target_bigrams_subset_of_corpus_bigrams(spark):
    """Pin the invariant `_dsir_scores`' single-pass rewrite rests on
    (VERDICT r16 item 6): every TARGET-head bigram exists in the
    CORPUS head — for the inline trainer AND the persisted store. The
    rewrite left-joins target onto corpus per bigram; a target bigram
    absent from the corpus head would silently drop its p_t
    contribution where the pre-r16 inner-join shape included it. The
    invariant holds by construction (the target slice doc_id % 4 = 0
    is a subset of the corpus, and both heads train from the same
    bigram type aggregate), but nothing outside this test proves it
    stays true if the head trainers ever diverge."""
    from udacity_dend_capstone_immigration_spark.workload.base import table
    from udacity_dend_capstone_immigration_spark.workload.textops import (
        _doc_bigrams,
        _dsir_train_heads,
        served_dsir_dir,
    )

    docs = table(spark, SF_DIR, "documents")
    scored_c, scored_t = _dsir_train_heads(_doc_bigrams(docs))
    orphans = scored_t.join(scored_c, "bigram", "left_anti")
    assert orphans.count() == 0, (
        "inline trainer: target-head bigrams missing from corpus head"
    )

    d = served_dsir_dir(spark, SF_DIR)
    pc = spark.read.parquet(f"{d}/pkn_corpus").select("bigram")
    pt = spark.read.parquet(f"{d}/pkn_target").select("bigram")
    assert pt.join(pc, "bigram", "left_anti").count() == 0, (
        "persisted store: target-head bigrams missing from corpus head"
    )
