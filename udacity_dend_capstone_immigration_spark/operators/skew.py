"""Skew-mitigation utilities.

AQE's skew-join splitting (on in the session factory) handles most skew
at runtime by subdividing oversized shuffle partitions. ``salted_join``
is the explicit fallback for the cases AQE can't fix — e.g. a single
hot key whose rows must still meet every matching build-side row, or
engines/stages where AQE is off. Salting splits each hot key into
``salt_buckets`` sub-keys: the large side gets a deterministic per-row
salt, the small side is replicated once per salt value, and the join key
becomes (key, salt) — same result set, shuffle spread over
``salt_buckets``× more reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    row_id_col: str | None = None,
) -> DataFrame:
    """Join ``large ⋈ small`` on column ``on`` with salt-split hot keys.

    The salt is ``xxhash64`` over the large side's full row —
    deterministic, no RNG, and rows of one hot key spread across all
    buckets. When the hot key's rows are exact duplicates the full-row
    hash collapses to one bucket; pass ``row_id_col`` naming a unique,
    DETERMINISTIC per-row column (stored key, parquet
    ``_metadata.row_index``) to keep the fan-out — see
    ``salted_count_sum`` for why the id must not be nondeterministic.
    The small side is exploded ``salt_buckets``× (keep it the
    genuinely small side). Result equals ``large.join(small, on, how)``
    with only inner/left supported (the replicated right side would
    multiply unmatched right rows under right/full joins).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_inputs = [F.col(c) for c in large.columns]
    if row_id_col is not None:
        if row_id_col not in large.columns:
            raise ValueError(f"row_id_col {row_id_col!r} not in {large.columns}")
        salt_inputs = [F.col(row_id_col)]
    salted_large = large.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*salt_inputs), F.lit(salt_buckets)).cast("int"),
    )
    replicated_small = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_large.join(replicated_small, [on, SALT_COL], how).drop(SALT_COL)


def salted_count_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
    row_id_col: str | None = None,
) -> DataFrame:
    """Two-stage salted aggregation for hot grouping keys: partial
    (count, exact-decimal sum) per (key, salt), then final rollup per
    key. Decimal addition is associative and exact, so the two-stage
    result is identical to the direct aggregate — this is manual
    map-side-combine with ``salt_buckets``× more reducers on stage one,
    for engines/stages where hash-partial aggregation alone leaves one
    reducer owning a hot key's final merge.

    The default salt is ``xxhash64`` over the full row — deterministic
    (retry-safe: a recomputed map task emits the same partials), but
    DEGENERATE when a hot key's rows are exact duplicates: identical rows
    hash to one bucket and the spread collapses to the unsalted plan.
    For that case pass ``row_id_col`` naming a column that is unique per
    row AND deterministic (e.g. a stored primary key, or parquet's
    ``_metadata.row_index`` materialized before calling) — it is mixed
    into the hash so duplicate rows still fan out. Do NOT feed a
    nondeterministic id (``monotonically_increasing_id`` computed
    inline): a retried map task would re-salt rows differently than the
    partials already fetched by finished reducers (the SPARK-23207
    shuffle-recompute hazard).

    Returns (key_cols..., cnt, total) with total a portable double
    (see ``workload.base.dsum``).
    """
    salt_inputs = [F.col(c) for c in df.columns]
    if row_id_col is not None:
        if row_id_col not in df.columns:
            raise ValueError(f"row_id_col {row_id_col!r} not in {df.columns}")
        salt_inputs = [F.col(row_id_col)]
    salted = df.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*salt_inputs), F.lit(salt_buckets)).cast("int"),
    )
    partial = salted.groupBy(*key_cols, SALT_COL).agg(
        F.count(F.lit(1)).alias("_c"),
        F.sum(F.col(value_col).cast("decimal(28,10)")).alias("_s"),
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_c").alias("cnt"),
        F.sum("_s").cast("double").alias("total"),
    )
