"""Z-order (Morton) clustering + min/max file skipping on plain parquet.

The lakehouse data-skipping stack (Delta ``OPTIMIZE ZORDER BY``,
Iceberg sort orders + manifest stats) delivered directly:

- **Write side**: bucket each clustering column to a ``bits``-wide
  integer rank, interleave the bits into one Morton z-value, then
  ``repartitionByRange`` + sort on it — each output file covers a
  compact z-range, i.e. a small RECTANGLE in (a, b) space, so a
  predicate box on EITHER or BOTH columns overlaps few files. A
  single-column sort gives perfect skipping on that column and none on
  the other; z-ordering trades a little of the first for a lot of the
  second — that trade is measured, not assumed, in
  ``tests/test_zorder.py``.
- **Read side**: per-file min/max column stats (the manifest) decide
  which files a bounds predicate can possibly touch; only those are
  listed to the scan, and the predicate is ALSO applied as a normal
  filter, so parquet row-group pruning stacks on top and correctness
  never depends on the stats. Here the stats come from the parquet
  footers at plan time (driver-side, one footer read per file); a
  production deployment persists them as a manifest table on write —
  same contents, no footer round-trip.

Everything is deterministic: bucket bounds are exact integer
arithmetic on collected min/max, so the layout (not just the values)
reproduces run to run.
"""

from __future__ import annotations

import functools
from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def interleave_bits(a: Column, b: Column, bits: int = 8) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of
    ``a`` lands at position 2i, bit i of ``b`` at 2i+1. Pure
    shift/and/or Column tree — whole-stage codegen, no UDF, no HOF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return functools.reduce(lambda x, y: x.bitwiseOR(y), terms)


def _bucket(col: Column, mn: int, mx: int, bits: int) -> Column:
    """Affine rank of an integer-valued column into 0..2^bits-1 —
    EXACT integer floor division (num − num % span, then an exact
    double division of the resulting multiple), so the bucketing is
    bit-identical everywhere. Spark's ``/`` is true double division:
    a plain `(x*2^bits)/span` cast loses exactness past 2^53 and can
    even round the maximum element into bucket 2^bits (whose low bits
    alias bucket 0 after interleaving). The guard keeps the exact-
    multiple division inside the double-exact range."""
    span = max(int(mx) - int(mn), 0) + 1
    if span * (2**bits) >= 2**53:
        raise ValueError(
            f"z-order bucket arithmetic needs span*2^bits < 2^53 "
            f"(span={span}, bits={bits}); pre-bucket the column coarser"
        )
    num = (col.cast("bigint") - F.lit(int(mn))) * F.lit(2**bits)
    return ((num - num % F.lit(span)) / F.lit(span)).cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` z-ordered on exactly two integer-valued columns.

    One bounded stats job (a 1-row min/max aggregate) fixes the bucket
    ranges, then the z-value is a pure expression; ``repartitionByRange``
    on it gives each task a compact z-slab and each output file a tight
    (min, max) box per clustering column. O(data) with one range
    exchange — the same cost class as any sorted write."""
    a, b = cols
    stats = df.agg(
        F.min(a).alias("mna"),
        F.max(a).alias("mxa"),
        F.min(b).alias("mnb"),
        F.max(b).alias("mxb"),
    ).first()
    z = interleave_bits(
        _bucket(F.col(a), stats["mna"], stats["mxa"], bits),
        _bucket(F.col(b), stats["mnb"], stats["mxb"], bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """The skipping manifest: per data file, min/max of each named
    column, from the parquet footers (row-group stats folded per
    file). Driver-side and bounded by file count — at production scale
    this list IS the manifest table a writer persists."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet") or name.startswith(("_", ".")):
            continue
        f = pq.ParquetFile(os.path.join(path, name))
        entry: dict = {"file": os.path.join(path, name)}
        idx = {c: f.schema_arrow.get_field_index(c) for c in cols}
        for c in cols:
            mn = mx = None
            for rg in range(f.metadata.num_row_groups):
                st = f.metadata.row_group(rg).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    mn, mx = None, None
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            entry[f"{c}_min"], entry[f"{c}_max"] = mn, mx
        out.append(entry)
    return out


def scan_with_skipping(
    spark: SparkSession,
    path: str,
    bounds: Mapping[str, tuple],
) -> tuple[DataFrame, int, int]:
    """Read ``path`` under closed-interval ``bounds`` per column,
    listing only the files whose stats boxes intersect the predicate
    box. Returns (df, files_read, files_total). Files with missing
    stats are conservatively kept; the bounds are re-applied as a real
    filter, so results never depend on the manifest being right —
    skipping is an I/O optimization, not a correctness gate."""
    stats = file_stats(path, list(bounds))
    keep = []
    for entry in stats:
        ok = True
        for c, (lo, hi) in bounds.items():
            mn, mx = entry[f"{c}_min"], entry[f"{c}_max"]
            if mn is not None and mx is not None and (mx < lo or mn > hi):
                ok = False
                break
        if ok:
            keep.append(entry["file"])
    if keep:
        df = spark.read.parquet(*keep)
    else:
        df = spark.read.parquet(path).limit(0)
    for c, (lo, hi) in bounds.items():
        df = df.where((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
    return df, len(keep), len(stats)
