"""Unit tests for overlapping token-window chunking
(``operators/chunking.py``) — window boundaries, tail handling, and the
degenerate inputs the oracle query can't probe (the testdata has no
empty documents)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.chunking import chunk_windows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def test_short_doc_is_one_full_chunk(spark):
    df = _docs(spark, [(1, "alpha beta gamma")])
    out = chunk_windows(df, "id", "text", chunk_size=64, stride=48).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_idx, r.n_chunk_tokens, r.chunk_text) == (0, 3, "alpha beta gamma")
    assert r.chunk_hash == hashlib.md5(b"alpha beta gamma").hexdigest()


def test_empty_and_whitespace_docs_yield_no_rows(spark):
    df = _docs(spark, [(1, ""), (2, "   "), (3, "!!!")])
    assert chunk_windows(df, "id", "text").count() == 0


def test_window_starts_and_tail_lengths(spark):
    # 10 tokens, chunk 4, stride 3 -> starts 1,4,7,10; lengths 4,4,4,1
    text = " ".join(f"t{i}" for i in range(10))
    df = _docs(spark, [(1, text)])
    out = (
        chunk_windows(df, "id", "text", chunk_size=4, stride=3)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [4, 4, 4, 1]
    assert out[1].chunk_text == "t3 t4 t5 t6"
    assert out[3].chunk_text == "t9"


def test_exact_multiple_has_no_empty_tail(spark):
    # 8 tokens, chunk 4, stride 4 -> starts 1,5; no start at 9
    text = " ".join(f"t{i}" for i in range(8))
    df = _docs(spark, [(1, text)])
    out = chunk_windows(df, "id", "text", chunk_size=4, stride=4).collect()
    assert sorted(r.n_chunk_tokens for r in out) == [4, 4]


def test_tokens_are_normalized_before_windowing(spark):
    df = _docs(spark, [(1, "Alpha,  BETA!gamma")])
    out = chunk_windows(df, "id", "text").collect()
    assert out[0].chunk_text == "alpha beta gamma"


def test_invalid_params_raise(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        chunk_windows(df, "id", "text", chunk_size=0)
    with pytest.raises(ValueError):
        chunk_windows(df, "id", "text", stride=0)


def test_plan_is_single_map_stage(spark):
    """The operator's contract: no Exchange of its own — it must
    pipeline into whatever shuffle the consumer adds."""
    df = _docs(spark, [(1, "a b c")])
    plan = chunk_windows(df, "id", "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
