"""Multimodal pipeline queries for the driver harness.

No media table ships in the testdata, so these queries *construct* media
blobs deterministically from ``documents`` (pack the utf-8 text as the
payload of the FAKE packed format) and then run the real binary-column
pipeline — mapInPandas decode over Arrow batches. Because pack→decode
round-trips exactly, the DuckDB oracle can compute the expected metadata
straight from the source columns without ever touching bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.operators.multimodal import decode_metadata
from udacity_dend_capstone_immigration_spark.workload.base import query, table


def documents_as_media(docs):
    """documents → (media_id, kind, fmt, data) with FAKE-packed payloads.

    Dims derive from stable columns: width = n_chars % 1000 + 1,
    height = (doc_id * 7) % 500 + 1, channels = 3. Packing is native
    (concat of binary literals + int encodings) — no Python in this step.
    """
    width = (F.col("n_chars") % 1000 + 1).cast("int")
    height = ((F.col("doc_id") * 7) % 500 + 1).cast("int")

    # little-endian 4-byte int as binary, built natively: reverse the
    # big-endian hex encoding pairwise via unhex(concat of swapped pairs)
    def le32(c):
        hexs = F.lpad(F.hex(c), 8, "0")
        return F.unhex(
            F.concat(
                F.substring(hexs, 7, 2),
                F.substring(hexs, 5, 2),
                F.substring(hexs, 3, 2),
                F.substring(hexs, 1, 2),
            )
        )

    data = F.concat(
        F.lit(b"FAKE"),
        le32(width),
        le32(height),
        le32(F.lit(3)),
        F.encode(F.col("text"), "utf-8"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("fmt"),
        data.alias("data"),
    )


@query(
    "multimodal_decode",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(n_chars % 1000 + 1 AS INT) AS width,
           CAST((doc_id * 7) % 500 + 1 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def multimodal_decode(spark, sf_dir):
    """Pack → Arrow-batched mapInPandas decode → typed metadata. The
    oracle recomputes the metadata from source columns, so the binary
    round-trip (including utf-8 byte lengths) is verified value-exact."""
    docs = table(spark, sf_dir, "documents")
    return decode_metadata(documents_as_media(docs))
