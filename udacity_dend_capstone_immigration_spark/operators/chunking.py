"""Overlapping token-window document chunking — the RAG / context-window
preprocessing step of a training-data pipeline: split each document into
fixed-size token windows with a configurable stride (overlap), emitting
one row per chunk with a stable content hash.

Scale design: the whole operator is a single MAP stage — tokenize once,
``posexplode`` the window starts, ``slice`` out each window (collection
expressions, whole-stage codegen'd per CLAUDE.md's HOF rule) — so it
pipelines into whatever shuffle the consumer adds (dedup on chunk_hash,
embedding join on (doc_id, chunk_idx), ...) with zero exchanges of its
own. Chunk text is re-derivable from (doc_id, chunk_idx), so consumers
that only need identity (dedup, contamination) can project the md5 and
never shuffle chunk bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from udacity_dend_capstone_immigration_spark.functions.text import tokenize


def chunk_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(id, chunk_idx, n_chunk_tokens, chunk_hash, chunk_text) rows: one
    per token window of ``chunk_size`` starting every ``stride`` tokens
    (1, 1+stride, ... while <= n_tokens). Tail windows are shorter;
    zero-token documents yield no rows. ``chunk_hash`` is md5 of the
    space-joined window (engine-portable).
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    toks = df.select(F.col(id_col), tokenize(text_col).alias("_t")).where(
        F.size("_t") >= 1
    )
    starts = F.sequence(F.lit(1), F.size("_t"), F.lit(stride))
    ex = toks.select(
        F.col(id_col), F.col("_t"), F.posexplode(starts).alias("chunk_idx", "_s")
    )
    chunk = F.slice("_t", F.col("_s"), F.lit(chunk_size))
    text = F.concat_ws(" ", chunk)
    return ex.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(text).alias("chunk_hash"),
        text.alias("chunk_text"),
    )
