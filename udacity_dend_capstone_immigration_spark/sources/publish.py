"""Write-audit-publish (WAP) atomic table publish on plain parquet.

Delta-spark is absent in this runtime (`writers.write_table` gates on
`delta_available()`), so the ACID-ish need it was standing in for —
readers never observe a partial or unvalidated write — is delivered
directly with the three-step lake pattern (the same shape Iceberg's
WAP branch / Delta's transaction log provide):

1. **write**  — the new snapshot lands in a fresh ``v_<id>/`` version
   directory under the table root; nothing references it yet, so a
   failed or half-finished write is invisible garbage, never a
   half-visible table.
2. **audit**  — data-quality checks run against the STAGED directory's
   read-back rows (not the in-memory frame — this validates what was
   actually persisted, including the partition-column round trip).
   A failing audit aborts with the staged dir removed; the live
   version is untouched.
3. **publish** — a one-line ``_CURRENT`` pointer file is swapped via
   write-temp-then-``os.replace`` — atomic on POSIX, so a reader
   resolves either the old version or the new one, never a torn
   pointer. (On an object store the pointer is a manifest object
   swapped by a conditional PUT; the layout is identical.)

Readers (:func:`read_published`) resolve ``_CURRENT`` then read that
version directory. Old versions are retained ``keep_versions`` deep
(the VACUUM retention window: a reader that resolved the pointer just
before a publish can still finish its scan), then pruned.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from udacity_dend_capstone_immigration_spark.sources.writers import write_table

_POINTER = "_CURRENT"
_LOG = "_PUBLISH_LOG"


class AuditFailedError(RuntimeError):
    """The staged snapshot failed its data-quality audit; nothing was
    published and the live version is unchanged."""


def current_version(root: str) -> str | None:
    """The published version name, or None if nothing is published."""
    try:
        with open(os.path.join(root, _POINTER)) as f:
            v = f.read().strip()
        return v or None
    except FileNotFoundError:
        return None


def published_versions(root: str) -> list[str]:
    """Publish history (oldest → newest), restricted to versions whose
    snapshot directory still exists — i.e. the readable time-travel
    window (history entries pruned past the retention window are
    excluded; a republished version keeps its newest position, matching
    the pruner's ordering)."""
    try:
        with open(os.path.join(root, _LOG)) as f:
            history = [line.strip() for line in f if line.strip()]
    except FileNotFoundError:
        return []
    seen: dict[str, None] = {}
    for v in history:
        seen.pop(v, None)
        seen[v] = None
    return [v for v in seen if os.path.isdir(os.path.join(root, v))]


def read_published(
    spark: SparkSession, root: str, version: str | int | None = None
) -> DataFrame:
    """Read a published snapshot. ``version=None`` → the CURRENT
    pointer; a version name → that snapshot; a non-positive int → a
    relative offset into the publish history (0 = newest published,
    -1 = the one before — Delta's ``VERSION AS OF`` done over the
    retention window). Raises if the requested snapshot was never
    published, or was pruned past ``keep_versions`` — time travel
    reaches exactly as far as retention, by design. An unpublished
    (staged-only or mid-crash) table is indistinguishable from an
    absent one, also by design."""
    if version is None:
        v = current_version(root)
        if v is None:
            raise FileNotFoundError(f"no published version under {root!r}")
    elif isinstance(version, int):
        if version > 0:
            raise ValueError("relative version must be 0 (newest) or negative")
        window = published_versions(root)
        if not window or -version >= len(window):
            raise FileNotFoundError(
                f"version offset {version} outside the retained window "
                f"({len(window)} snapshots) under {root!r}"
            )
        v = window[version - 1]
    else:
        v = version
        if v not in published_versions(root):
            raise FileNotFoundError(
                f"version {v!r} was never published or is pruned under {root!r}"
            )
    return spark.read.parquet(os.path.join(root, v))


def publish_table(
    df: DataFrame,
    root: str,
    partition_by: Sequence[str] | None = None,
    audit: Callable[[DataFrame], None] | None = None,
    keep_versions: int = 2,
    stage_hook: Callable[[str], None] | None = None,
) -> str:
    """WAP-publish ``df`` as the new current version of the table at
    ``root``; returns the version name. ``audit`` receives the staged
    READ-BACK DataFrame and raises to veto (any exception → staged dir
    removed, :class:`AuditFailedError` re-raised, live version
    untouched). ``stage_hook`` (if given) receives the STAGED DIRECTORY
    PATH after the audit passes and before the pointer swap — the slot
    for sidecar artifacts that must exist the instant a version goes
    live (compatible_publish's schema manifest; an r13-advice fix: a
    manifest written after the swap leaves a crash window where the
    live version is manifest-less and the next contract check falls
    back to the lossy parquet read-back schema). A hook failure vetoes
    like an audit failure. A crash anywhere before the final
    ``os.replace`` leaves the previous version live."""
    spark = df.sparkSession
    os.makedirs(root, exist_ok=True)
    version = f"v_{uuid.uuid4().hex[:12]}"
    staged = os.path.join(root, version)
    write_table(df, staged, partition_by=partition_by)
    if audit is not None:
        try:
            audit(spark.read.parquet(staged))
        except Exception as e:
            shutil.rmtree(staged, ignore_errors=True)
            raise AuditFailedError(
                f"audit vetoed staged version {version}: {e}"
            ) from e
    if stage_hook is not None:
        try:
            stage_hook(staged)
        except Exception as e:
            shutil.rmtree(staged, ignore_errors=True)
            raise AuditFailedError(
                f"stage hook failed for staged version {version}: {e}"
            ) from e
    # atomic pointer swap: temp file + rename, never an in-place write
    tmp = os.path.join(root, f".{_POINTER}.{version}")
    with open(tmp, "w") as f:
        f.write(version + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _POINTER))
    # append-only publish history: pruning counts ONLY published
    # versions toward the retention window (see _prune_versions)
    with open(os.path.join(root, _LOG), "a") as f:
        f.write(version + "\n")
    _prune_versions(root, keep=keep_versions)
    return version


def _prune_versions(root: str, keep: int) -> None:
    """Drop published versions beyond the ``keep`` most recent — the
    retention window that lets an already-resolved reader finish its
    scan. Only versions recorded in the publish history count toward
    (or are eligible for) the window: a crashed writer's orphan ``v_*``
    dir was never resolvable by any reader, so it must neither occupy a
    retention slot (which would prune a REAL previous version mid-scan)
    nor be deleted here (it may be another writer's in-flight stage —
    crashed-stage garbage collection is a separate, age-based concern)."""
    try:
        with open(os.path.join(root, _LOG)) as f:
            history = [line.strip() for line in f if line.strip()]
    except FileNotFoundError:
        return
    live = current_version(root)
    # de-dup (a version republished later keeps its newest position)
    seen: dict[str, None] = {}
    for v in history:
        seen.pop(v, None)
        seen[v] = None
    ordered = list(seen)  # oldest → newest
    for d in ordered[: -max(keep, 1)]:
        if d != live:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)


class SchemaCompatibilityError(RuntimeError):
    """The staged snapshot's schema would break existing readers."""


_SCHEMA_MANIFEST = "_contract_schema.json"


def _canon_type(dt):
    """Nullability-insensitive type identity: the parquet round trip
    force-nullables every column AND nested element (array<double NOT
    NULL> reads back containsNull=true), so read compatibility compares
    types with all nullability flags normalized true."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, StructType):
        return StructType(
            [StructField(f.name, _canon_type(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, ArrayType):
        return ArrayType(_canon_type(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(_canon_type(dt.keyType), _canon_type(dt.valueType), True)
    return dt


def check_backward_compatible(prev, new) -> None:
    """Data-contract gate for :func:`publish_table`'s audit hook: a new
    snapshot may ADD nullable columns, but dropping a column, changing
    a column's type, or adding a non-nullable column breaks readers
    that resolved the previous version's contract — reject those at
    publish time, before the pointer swap makes them live.

    ``prev`` / ``new`` are StructTypes. Raises
    :class:`SchemaCompatibilityError` listing every violation (one
    pass, all findings — a contract CI check, not a fail-fast parse).
    Nullability changes on EXISTING columns pass either way: on plain
    parquet readers see values, not constraints, so only type identity
    is read compatibility — matching Delta/Iceberg evolution rules."""
    prev_fields = {f.name: f for f in prev.fields}
    new_fields = {f.name: f for f in new.fields}
    problems: list[str] = []
    for name, pf in prev_fields.items():
        nf = new_fields.get(name)
        if nf is None:
            problems.append(f"column dropped: {name} ({pf.dataType.simpleString()})")
        elif _canon_type(nf.dataType) != _canon_type(pf.dataType):
            problems.append(
                f"column retyped: {name} "
                f"{pf.dataType.simpleString()} -> {nf.dataType.simpleString()}"
            )
    for name, nf in new_fields.items():
        if name not in prev_fields and not nf.nullable:
            problems.append(f"non-nullable column added: {name}")
    if problems:
        raise SchemaCompatibilityError("; ".join(sorted(problems)))


def compatible_publish(df: DataFrame, root: str, **kwargs) -> str:
    """:func:`publish_table` with the backward-compatibility contract
    enforced against the CURRENT published version (first publish is
    unconstrained). The schema gate runs BEFORE staging — nothing is
    written on a contract violation; a caller ``audit`` in ``kwargs``
    still runs against the staged read-back as usual."""
    import json as _json

    from pyspark.sql.types import StructType

    v = current_version(root)
    if v is not None:
        # prefer the schema MANIFEST the previous compatible_publish
        # left beside its snapshot — the exact logical input schema.
        # The parquet read-back fallback force-nullables everything and
        # retypes inferred partition columns (string day -> date), so
        # manifest-less comparisons are nullability-insensitive by
        # construction (_canon_type) but can still mis-see a partition
        # column's logical type.
        manifest = os.path.join(root, v, _SCHEMA_MANIFEST)
        if os.path.exists(manifest):
            with open(manifest) as fh:
                prev_schema = StructType.fromJson(_json.load(fh))
        else:
            prev_schema = df.sparkSession.read.parquet(os.path.join(root, v)).schema
        # checked on the INPUT frame's schema, before any write: the
        # staged read-back can't see an added column's non-nullability
        check_backward_compatible(prev_schema, df.schema)
    # the manifest lands in the STAGED dir before the pointer swap, so
    # a live version always carries it (crash-window fix, r13 advice).
    # A caller's own stage_hook CHAINS after the manifest write instead
    # of colliding with the claimed keyword (r14 review fix).
    caller_hook = kwargs.pop("stage_hook", None)

    def _write_manifest(staged_dir: str) -> None:
        with open(os.path.join(staged_dir, _SCHEMA_MANIFEST), "w") as fh:
            _json.dump(df.schema.jsonValue(), fh)
        if caller_hook is not None:
            caller_hook(staged_dir)

    return publish_table(df, root, stage_hook=_write_manifest, **kwargs)


def rollback(root: str) -> str:
    """Repoint ``_CURRENT`` at the previous published version — the
    incident lever time travel exists for (a bad publish that passed
    its audit). The same atomic pointer swap as publish; the rolled-to
    version is re-appended to the history so it becomes the newest
    entry (a subsequent rollback steps back again, and retention counts
    it as live). Raises if there is no previous version inside the
    retention window — rollback reaches exactly as far as time travel,
    by design."""
    window = published_versions(root)
    live = current_version(root)
    if live in window:
        window = window[: window.index(live) + 1]
    if len(window) < 2:
        raise FileNotFoundError(
            f"no previous published version to roll back to under {root!r}"
        )
    target = window[-2]
    tmp = os.path.join(root, f".{_POINTER}.{target}")
    with open(tmp, "w") as f:
        f.write(target + "\n")
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _POINTER))
    with open(os.path.join(root, _LOG), "a") as f:
        f.write(target + "\n")
    return target
