"""Scan-parallelism guard for explode-heavy operators.

A single parquet file with one row group is UNSPLITTABLE — Spark reads
it as one partition no matter what ``spark.sql.files.maxPartitionBytes``
says (the driver testdata ships exactly that shape: documents and events
are one row group each). Any operator that fans a compact input out
~100-300× per row (shingle explodes, k-gram hashing, per-token bit
contributions) then runs its whole map stage on ONE core while the rest
of the machine idles — measured 10s vs 2s on winnowing fingerprints at
sf0.1.

:func:`spread_scan` round-robin repartitions the COMPACT pre-explode
rows to full parallelism, but only when the plan's scan produces fewer
partitions than the cluster has slots — on a real multi-split layout
(any production table at scale) it is a no-op and adds no exchange.
"""

from __future__ import annotations

import logging
import os
import re
from urllib.parse import unquote, urlparse

from pyspark.errors import PySparkException
from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

_SIZE_SUFFIX = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
                "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}


def _parse_bytes(raw: str) -> int:
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", raw)
    if not m or m.group(2).lower() not in _SIZE_SUFFIX:
        return 128 << 20
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2).lower()]


def probe_scan_partitions(df: DataFrame) -> int | None:
    """Cheap estimate of the data-bearing partition count of a
    file-backed plan, from the file listing + parquet footers — no
    ``df.rdd`` (which costs an extra physical-plan compile per call).

    Mirrors Spark's ``FilePartition`` split math: ``maxSplitBytes =
    min(maxPartitionBytes, max(openCostInBytes, totalBytes /
    minPartitionNum))`` where ``totalBytes`` pads each file with the
    open cost, then files are chunked to ``maxSplitBytes`` and greedily
    bin-packed (each chunk again padded with the open cost — so many
    small files do NOT pack into one split under the default 4 MiB open
    cost, and a small scan on a many-core session is parallelism-sliced
    via ``minPartitionNum``). A row group lands wholly in the one chunk
    holding its midpoint, so the data-bearing count is additionally
    bounded by the total row-group count. Returns ``None`` (caller
    falls back to the RDD probe) for plans that aren't
    local-parquet-scan-shaped: no input files (in-memory / shuffled /
    streaming sources), remote storage, or non-parquet formats. Only
    meaningful for scan + narrow-transform plans — the contract
    spread_scan documents.
    """
    try:
        files = df.inputFiles()
    except PySparkException:
        return None
    if not files:
        return None
    try:
        import pyarrow.parquet as pq

        total_rg = 0
        sizes: list[int] = []
        for uri in files:
            parsed = urlparse(uri)
            if parsed.scheme not in ("file", ""):
                return None
            path = unquote(parsed.path)
            if not path.endswith((".parquet", ".parq")):
                return None
            sizes.append(os.path.getsize(path))
            total_rg += pq.ParquetFile(path).metadata.num_row_groups
    except Exception:  # noqa: BLE001 — any probe failure → RDD fallback
        return None
    spark = df.sparkSession
    conf = spark.conf
    mpb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304b"))

    def _int_conf(key: str) -> int | None:
        try:
            return int(conf.get(key))
        except Exception:  # noqa: BLE001 — unset/non-int → next fallback
            return None

    # chain on `is None`, not truthiness: an explicitly configured 0 is a
    # (degenerate) real setting Spark itself would honor, not "unset"
    min_pn = _int_conf("spark.sql.files.minPartitionNum")
    if min_pn is None:
        min_pn = _int_conf("spark.sql.leafNodeDefaultParallelism")
    if min_pn is None:
        min_pn = spark.sparkContext.defaultParallelism
    total_bytes = sum(sizes) + len(sizes) * open_cost
    max_split = min(mpb, max(open_cost, total_bytes // max(1, min_pn)))
    # chunk each file to maxSplitBytes, then greedy-pack chunks desc
    # (exactly FilePartition.getFilePartitions: close the partition
    # when the next chunk would overflow, charge open_cost per chunk)
    chunks: list[int] = []
    for sz in sizes:
        while sz > max_split:
            chunks.append(max_split)
            sz -= max_split
        if sz > 0:
            chunks.append(sz)
    chunks.sort(reverse=True)
    parts = 0
    cur = 0
    for c in chunks:
        if cur + c > max_split and cur > 0:
            parts += 1
            cur = 0
        cur += c + open_cost
    if cur > 0:
        parts += 1
    return max(1, min(total_rg, parts))


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its current plan
    yields fewer partitions; identity otherwise. Call on narrow rows
    (ids + text to be exploded), never on already-fanned-out output.

    The partition count comes from :func:`probe_scan_partitions` (file
    listing + footers, no extra plan compile) when the plan is a local
    parquet scan — the driver-testdata case this helper exists for.
    Other plans fall back to the ``df.rdd`` probe, which is undefined
    for streaming/unsupported shapes — those fall through to identity
    (logged), so batch/streaming twins can share operator code. Any
    non-Spark exception is a real bug and propagates.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    nparts = probe_scan_partitions(df)
    if nparts is None:
        try:
            nparts = df.rdd.getNumPartitions()
        except PySparkException as exc:
            # streaming plans (and other non-RDD-convertible shapes) can't
            # be probed; skipping the spread is correct but worth a trace —
            # a scan that silently stays at 1 partition is the exact
            # failure this helper exists to fix.
            logger.debug("spread_scan skipped (plan not probeable): %s", exc)
            return df
    if nparts >= target:
        return df
    return df.repartition(target)
