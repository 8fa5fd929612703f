"""MERGE INTO parity on plain partitioned parquet (SCD1 upsert).

Delta/Iceberg ship ``MERGE`` as a table-format primitive; this runtime
has neither (``sources/writers.py`` gates the Delta sink on the absent
package), so the lake need is delivered directly, the same way
``sources/publish.py`` stands in for ACID publish: rewrite ONLY the
partitions an update batch touches, through Spark's dynamic partition
overwrite.

Cost model (the part that matters at 100 TB): a MERGE's floor is
rewriting the files that contain matched rows — Delta does exactly
that. Here the rewrite unit is the partition directory:

- touched partitions = the update batch's own partition values ∪ the
  base partitions currently holding an updated key (the second set
  covers partition-MOVING updates — without it the moved-from
  partition would keep the stale row);
- the write is ``base(touched) ⟕anti keys ∪ updates`` under
  ``partitionOverwriteMode=dynamic`` — untouched partitions are never
  read past the key probe and never rewritten.

Update rows REPLACE matched base rows whole-row (SCD1). The batch must
be key-unique — dedupe upstream with the keep-latest pattern
(``events_latest_per_key``) when ingesting CDC streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet


def merge_upsert(
    spark: SparkSession,
    store_dir: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
) -> list:
    """Upsert ``updates`` into the partitioned parquet store at
    ``store_dir``. Returns the list of touched partition values.

    The touched-partition list is collected driver-side — bounded by
    the layout guardrail (``DEFAULT_MAX_PARTITIONS``), the same
    eager-decision contract as the ANN probe lists. The rewritten
    rows are pinned with an eager ``localCheckpoint`` before the write:
    it cuts the lineage back to the store being overwritten (Spark
    refuses a self-referential overwrite otherwise) and bounds the
    in-flight state at O(touched partitions) — the same I/O class as a
    Delta MERGE's file rewrite. For merges whose touched set is too
    large to pin, fold through the staging-then-rename swap
    (`compact_index_cells`) instead.
    """
    base = spark.read.parquet(store_dir)
    keys = updates.select(*key_cols).distinct()
    up_parts = updates.select(F.col(partition_col).alias("p")).distinct()
    moved_from = (
        base.join(F.broadcast(keys), list(key_cols), "left_semi")
        .select(F.col(partition_col).alias("p"))
        .distinct()
    )
    touched = sorted(
        {r["p"] for r in up_parts.unionByName(moved_from).distinct().collect()}
    )
    kept = base.where(F.col(partition_col).isin(touched)).join(
        F.broadcast(keys), list(key_cols), "left_anti"
    )
    out = kept.unionByName(updates.select(*base.columns)).localCheckpoint(eager=True)
    prior = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        write_parquet(out, store_dir, partition_by=[partition_col], mode="overwrite")
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prior)
    return touched
