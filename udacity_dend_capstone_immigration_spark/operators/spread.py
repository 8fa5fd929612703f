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
rows to full parallelism, but only when the plan's scan produced fewer
partitions than the cluster has slots — on a real multi-split layout
(any production table at scale) it is a no-op and adds no exchange.
"""

from __future__ import annotations

import logging

from pyspark.errors import PySparkException
from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)


def spread_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff its current plan
    yields fewer partitions; identity otherwise. Call on narrow rows
    (ids + text to be exploded), never on already-fanned-out output.

    The partition probe converts the plan to an RDD, which is undefined
    for streaming/unsupported plans — those fall through to identity
    (logged), so batch/streaming twins can share operator code. Any
    non-Spark exception is a real bug and propagates.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        nparts = df.rdd.getNumPartitions()
    except PySparkException as exc:
        # streaming plans (and other non-RDD-convertible shapes) can't be
        # probed; skipping the spread is correct but worth a trace — a
        # scan that silently stays at 1 partition is the exact failure
        # this helper exists to fix.
        logger.debug("spread_scan skipped (plan not probeable): %s", exc)
        return df
    if nparts >= target:
        return df
    return df.repartition(target)
