"""Multimodal (image/audio/video) columns: opaque ``binary`` payloads +
typed metadata, processed with Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
iteration — is real and tested. The codec layer is pluggable: this
container ships no image/audio libraries, so the default codec is a
deterministic packed format (``FAKE`` header, below) that exercises the
full path end-to-end; hooking Pillow/torchaudio in is a codec swap, not
a pipeline change (``set_codec``). Calling a real-media operation
without a real codec raises ``CodecUnavailableError`` — loudly, not with
garbage output.

Scale notes: media bytes are the heaviest column in any training
pipeline. Every operator here projects the binary column as late as
possible, processes it in Arrow record batches (bounded memory:
``spark.sql.execution.arrow.maxRecordsPerBatch``), and returns compact
features — so the shuffle after feature extraction carries vectors, not
media. Frame sampling explodes ONLY sampled frame indexes, never full
decoded frames.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-table schema: payload is opaque; everything queryable
#: lives in typed metadata columns.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("fmt", StringType()),
        StructField("data", BinaryType()),
    ]
)

DECODED_IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_data", BinaryType()),
    ]
)


class CodecUnavailableError(NotImplementedError):
    """A real media codec was requested but no library is installed."""


# ---------------------------------------------------------------- codec

_MAGIC = b"FAKE"


def pack_fake_media(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Deterministic packed media blob: 4-byte magic + 3 dims + payload.

    Stands in for JPEG/WAV/MP4 so the decode path is real parsing over
    real bytes, reproducible in any environment.
    """
    return _MAGIC + struct.pack("<III", width, height, channels) + payload


class FakeCodec:
    """Parses the packed format above; the default (and only bundled) codec."""

    name = "fake"

    def decode(self, data: bytes) -> dict:
        if data[:4] != _MAGIC:
            raise ValueError("not a FAKE-packed media blob")
        width, height, channels = struct.unpack("<III", data[4:16])
        return {
            "width": width,
            "height": height,
            "channels": channels,
            "n_bytes": len(data) - 16,
        }

    def feature(self, data: bytes, dim: int) -> list[float]:
        """Deterministic pseudo-embedding: md5-chained floats in [0, 1)."""
        out: list[float] = []
        seed = data
        while len(out) < dim:
            seed = hashlib.md5(seed).digest()
            out.extend(
                int.from_bytes(seed[i : i + 4], "little") / 2**32
                for i in range(0, 16, 4)
            )
        return out[:dim]

    def resize(self, data: bytes, width: int, height: int) -> bytes:
        meta = self.decode(data)
        payload = hashlib.md5(data).digest()
        return pack_fake_media(width, height, meta["channels"], payload)

    def frame(self, data: bytes, idx: int) -> bytes:
        return hashlib.md5(data + struct.pack("<I", idx)).digest()

    def content_digest(self, data: bytes) -> str:
        """md5 of the CONTENT (payload after the 16-byte header) — the
        exact-dup fingerprint, invariant to repacks that change only
        dims. A real codec would hash decoded samples the same way."""
        self.decode(data)  # validates the container
        return hashlib.md5(data[16:]).hexdigest()


class RealCodec:
    """Placeholder for a Pillow/av-backed codec. Every method raises
    :class:`CodecUnavailableError` until the libraries exist in the
    runtime — the pipeline shape does not change when they do."""

    name = "real"

    def _unavailable(self, *_a, **_k):
        raise CodecUnavailableError(
            "no image/audio library in this runtime; install one and "
            "register a codec via set_codec()"
        )

    decode = feature = resize = frame = content_digest = _unavailable


_CODEC = FakeCodec()


def set_codec(codec) -> None:
    """Swap the module-level codec (e.g. for a Pillow-backed one)."""
    global _CODEC
    _CODEC = codec


# ------------------------------------------------------------ operators


def decode_metadata(media: DataFrame) -> DataFrame:
    """binary → typed metadata via Arrow-batched mapInPandas.

    Input needs (media_id, data); output is DECODED_IMAGE_SCHEMA. The
    batch loop never materializes more than one Arrow batch of media
    bytes per task.
    """
    codec = _CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            metas = [codec.decode(bytes(b)) for b in pdf["data"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                    "n_bytes": [m["n_bytes"] for m in metas],
                }
            )

    return media.select("media_id", "data").mapInPandas(run, DECODED_IMAGE_SCHEMA)


def payload_fingerprints(media: DataFrame) -> DataFrame:
    """binary → (media_id, fingerprint): the codec's content digest in
    one Arrow stage. Downstream dedup shuffles 32-char hashes, never
    media bytes — the binary-column twin of text exact-dedup."""
    codec = _CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "fingerprint": [codec.content_digest(bytes(b)) for b in pdf["data"]],
                }
            )

    return media.select("media_id", "data").mapInPandas(
        run, "media_id long, fingerprint string"
    )


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """binary → fixed-width float feature vector (pseudo-embedding under
    the fake codec; a model forward pass under a real one). Output rows
    are compact — downstream similarity joins shuffle vectors, not media."""
    codec = _CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "feature": [codec.feature(bytes(b), dim) for b in pdf["data"]],
                }
            )

    return media.select("media_id", "data").mapInPandas(run, FEATURE_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """binary → resized binary, preserving the media-table schema."""
    codec = _CODEC

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["data"] = [codec.resize(bytes(b), width, height) for b in pdf["data"]]
            yield out

    return media.mapInPandas(run, media.schema)


def sample_frames(media: DataFrame, every_n: int = 10, n_frames_col: str = "n_frames") -> DataFrame:
    """Video frame sampling: explode sampled frame INDEXES natively
    (cheap int rows), then decode only those frames in one mapInPandas
    pass — never the full frame set."""
    codec = _CODEC
    # sequence(0, -1, +step) THROWS (F.sequence with a positive step
    # requires start <= stop) — guard n_frames < 1 / NULL to an empty
    # index array, same rule as functions/text.py:_index_range
    safe_seq = F.when(
        F.col(n_frames_col) >= 1,
        F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    idx = media.select(
        "media_id",
        "data",
        F.explode(safe_seq).alias("frame_idx"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "frame_idx": pdf["frame_idx"].values,
                    "frame_data": [
                        codec.frame(bytes(b), int(i))
                        for b, i in zip(pdf["data"], pdf["frame_idx"])
                    ],
                }
            )

    return idx.mapInPandas(run, FRAME_SCHEMA)


def payload_chunk_fingerprints(
    media: DataFrame, chunk_size: int = 256, header_len: int = 16
) -> DataFrame:
    """Fixed-size BYTE windows over each payload's content (the bytes
    after the ``header_len`` codec header) with a per-window digest —
    the sub-file storage-dedup primitive: two media sharing a run of
    content at window-aligned offsets share window digests even when
    their full payloads (and so ``payload_fingerprints``) differ.

    Entirely JVM-native: binary ``substring`` windows + ``md5(hex(…))``
    digests (md5-of-hex rather than md5-of-blob because the DuckDB
    oracle's md5 is VARCHAR-only — hex round-trips bytes exactly and
    identically in both engines, verified uppercase parity). The only
    row growth is the bounded ~payload/chunk_size explode; emitted
    rows carry offsets + digests, never chunk bytes — downstream
    dedup shuffles stay fingerprint-sized at any corpus.

    Returns (media_id, chunk_idx, offset, n_bytes, digest); offset is
    0-based within the CONTENT (header excluded). Empty payloads yield
    no rows. Final window may run short; no fully-empty tail.
    """
    plen = (F.length("data") - F.lit(header_len)).alias("plen")
    d = media.select("media_id", "data", plen).where(F.col("plen") > 0)
    # ceil(plen/size) via exact-integer bucketing (num − num % span —
    # Column `/` is double division, CLAUDE.md rule)
    over = F.col("plen") - 1
    n_chunks = ((over - over % chunk_size) / chunk_size).cast("int") + 1
    ex = d.select(
        "media_id",
        "data",
        "plen",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.expr(
        f"substring(data, {header_len + 1} + chunk_idx * {chunk_size}, {chunk_size})"
    )
    return ex.select(
        "media_id",
        "chunk_idx",
        (F.col("chunk_idx") * chunk_size).cast("int").alias("offset"),
        F.least(
            F.lit(chunk_size), F.col("plen") - F.col("chunk_idx") * chunk_size
        ).cast("int").alias("n_bytes"),
        F.md5(F.hex(chunk)).alias("digest"),
    )


#: Deterministic gear table for content-defined chunking: entry i is
#: the first 8 bytes of md5(byte i) — reproducible everywhere, no RNG.
def _gear_table() -> list:
    import hashlib

    return [
        int(hashlib.md5(bytes([i])).hexdigest()[:16], 16) for i in range(256)
    ]


def cdc_boundaries(
    content: bytes,
    avg_size: int = 256,
    min_size: int = 64,
    max_size: int = 1024,
    gear: list | None = None,
) -> list:
    """Gear-hash content-defined chunk boundaries (FastCDC's core idea,
    public literature): roll ``h = (h << 1) + gear[b]`` over the bytes
    and cut where ``h & (avg_size - 1) == 0`` past ``min_size``, with a
    ``max_size`` forced cut. Returns (offset, length) pairs covering
    the content exactly. Boundaries depend only on LOCAL content, so a
    byte-shifted copy re-synchronizes and shares all interior chunks —
    the property fixed windows lack."""
    if gear is None:
        gear = _gear_table()
    mask = avg_size - 1
    assert avg_size & mask == 0, "avg_size must be a power of two"
    out = []
    start = 0
    h = 0
    n = len(content)
    for i, b in enumerate(content):
        h = ((h << 1) + gear[b]) & 0xFFFFFFFFFFFFFFFF
        ln = i - start + 1
        if (ln >= min_size and (h & mask) == 0) or ln >= max_size:
            out.append((start, ln))
            start = i + 1
            h = 0
    if start < n:
        out.append((start, n - start))
    return out


def cdc_chunk_fingerprints(
    media: DataFrame,
    avg_size: int = 256,
    min_size: int = 64,
    max_size: int = 1024,
    header_len: int = 16,
) -> DataFrame:
    """Content-defined twin of :func:`payload_chunk_fingerprints`:
    chunk boundaries follow the BYTES (gear-hash), so shared content
    dedups across media even at arbitrary byte offsets — the
    storage/dedup behavior fixed windows only give at aligned offsets.
    Arrow ``mapInPandas`` (per-byte rolling hash is inherently
    imperative); emitted rows carry offsets + md5 digests, never chunk
    bytes. Returns (media_id, chunk_idx, offset, n_bytes, digest)."""
    import hashlib

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("chunk_idx", IntegerType()),
            StructField("offset", IntegerType()),
            StructField("n_bytes", IntegerType()),
            StructField("digest", StringType()),
        ]
    )
    gear = _gear_table()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [], "chunk_idx": [], "offset": [],
                "n_bytes": [], "digest": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                content = bytes(data)[header_len:]
                for k, (off, ln) in enumerate(
                    cdc_boundaries(content, avg_size, min_size, max_size, gear)
                ):
                    out["media_id"].append(int(mid))
                    out["chunk_idx"].append(k)
                    out["offset"].append(off)
                    out["n_bytes"].append(ln)
                    out["digest"].append(
                        hashlib.md5(content[off : off + ln]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.select("media_id", "data").mapInPandas(run, schema)
