"""Write-audit-publish atomic parquet publish (sources/publish.py):
readers must never observe a partial, unvalidated, or torn table state
— the Delta-absent ACID pattern (r11 verdict "Next round #5")."""

from __future__ import annotations

import glob
import os
import tempfile

import pytest

from udacity_dend_capstone_immigration_spark.sources.publish import (
    AuditFailedError,
    current_version,
    publish_table,
    read_published,
)
from udacity_dend_capstone_immigration_spark.sources.writers import write_table


def _df(spark, n):
    return spark.range(n).selectExpr("id", "id * 2 AS v")


def test_publish_then_read_roundtrip(spark):
    root = tempfile.mkdtemp(prefix="wap_t_")
    v = publish_table(_df(spark, 5), root)
    assert current_version(root) == v
    assert sorted(r["v"] for r in read_published(spark, root).collect()) == [0, 2, 4, 6, 8]


def test_unpublished_table_is_absent(spark):
    root = tempfile.mkdtemp(prefix="wap_t_")
    with pytest.raises(FileNotFoundError):
        read_published(spark, root)


def test_crash_between_write_and_publish_keeps_old_version(spark):
    # simulate a writer dying AFTER its version dir landed but BEFORE
    # the pointer swap: the staged dir is invisible garbage
    root = tempfile.mkdtemp(prefix="wap_t_")
    publish_table(_df(spark, 3), root)
    write_table(_df(spark, 100), os.path.join(root, "v_crashed0000"))
    assert read_published(spark, root).count() == 3
    # and the next successful publish supersedes cleanly
    publish_table(_df(spark, 7), root)
    assert read_published(spark, root).count() == 7


def test_audit_veto_removes_staged_and_keeps_live(spark):
    root = tempfile.mkdtemp(prefix="wap_t_")
    live = publish_table(_df(spark, 4), root)

    def veto(staged):
        raise ValueError("rows look wrong")

    with pytest.raises(AuditFailedError):
        publish_table(_df(spark, 9), root, audit=veto)
    assert current_version(root) == live
    assert read_published(spark, root).count() == 4
    # the vetoed staged dir was removed — no garbage accumulates
    assert len(glob.glob(os.path.join(root, "v_*"))) == 1


def test_audit_sees_read_back_rows_not_the_frame(spark):
    root = tempfile.mkdtemp(prefix="wap_t_")
    seen = {}

    def spy(staged):
        seen["n"] = staged.count()

    publish_table(_df(spark, 6), root, audit=spy)
    assert seen["n"] == 6


def test_prune_keeps_retention_window(spark):
    root = tempfile.mkdtemp(prefix="wap_t_")
    for n in (1, 2, 3, 4):
        v = publish_table(_df(spark, n), root, keep_versions=2)
    dirs = glob.glob(os.path.join(root, "v_*"))
    assert len(dirs) == 2
    assert current_version(root) == v
    assert read_published(spark, root).count() == 4
    # no leftover temp pointer files
    assert not glob.glob(os.path.join(root, "._CURRENT.*"))


def test_crashed_stage_does_not_occupy_a_retention_slot(spark):
    # a crashed writer's orphan v_* dir was never resolvable — it must
    # not push a REAL previous version out of the retention window
    # (a reader that just resolved it may still be scanning)
    root = tempfile.mkdtemp(prefix="wap_t_")
    v1 = publish_table(_df(spark, 3), root, keep_versions=2)
    write_table(_df(spark, 99), os.path.join(root, "v_crashed0000"))
    publish_table(_df(spark, 5), root, keep_versions=2)
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(root, "v_*"))}
    assert v1 in dirs  # the real previous version survived
    assert "v_crashed0000" in dirs  # the orphan is not pruned here either
    # a third publish retires v1 (now beyond the window)
    publish_table(_df(spark, 7), root, keep_versions=2)
    dirs = {os.path.basename(d) for d in glob.glob(os.path.join(root, "v_*"))}
    assert v1 not in dirs
    assert read_published(spark, root).count() == 7


def test_time_travel_window_and_errors(spark, tmp_path):
    import pytest

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        published_versions,
        publish_table,
        read_published,
    )

    root = str(tmp_path / "tt")
    vs = [
        publish_table(
            spark.createDataFrame([(i,)], "gen long"), root, keep_versions=2
        )
        for i in range(3)
    ]
    window = published_versions(root)
    # retention keeps 2: the oldest snapshot is pruned from the window
    assert window == vs[1:]
    assert read_published(spark, root).first()["gen"] == 2
    assert read_published(spark, root, version=0).first()["gen"] == 2
    assert read_published(spark, root, version=-1).first()["gen"] == 1
    assert read_published(spark, root, version=vs[1]).first()["gen"] == 1
    with pytest.raises(FileNotFoundError):
        read_published(spark, root, version=-2)  # pruned past retention
    with pytest.raises(FileNotFoundError):
        read_published(spark, root, version=vs[0])  # pruned name
    with pytest.raises(FileNotFoundError):
        read_published(spark, root, version="v_nonexistent")
    with pytest.raises(ValueError):
        read_published(spark, root, version=1)


def test_compatible_publish_allows_added_nullable_column(spark, tmp_path):
    from udacity_dend_capstone_immigration_spark.sources.publish import (
        compatible_publish,
        read_published,
    )

    root = str(tmp_path / "contract")
    df1 = spark.createDataFrame([(1, "a")], "k long, s string")
    compatible_publish(df1, root)
    df2 = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, extra double")
    compatible_publish(df2, root)
    assert set(read_published(spark, root).columns) == {"k", "s", "extra"}


def test_compatible_publish_rejects_drop_and_retype(spark, tmp_path):
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        SchemaCompatibilityError,
        compatible_publish,
        current_version,
    )

    root = str(tmp_path / "contract2")
    df1 = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, v double")
    v1 = compatible_publish(df1, root)
    # dropped column s AND retyped v -> both violations listed
    bad = spark.createDataFrame([(1, 2)], "k long, v int")
    with _pytest.raises(SchemaCompatibilityError) as ei:
        compatible_publish(bad, root)
    msg = str(ei.value)
    assert "column dropped: s" in msg and "column retyped: v" in msg
    # the failed publish left the previous version live (WAP veto)
    assert current_version(root) == v1


def test_compatible_publish_rejects_non_nullable_addition(spark, tmp_path):
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        SchemaCompatibilityError,
        compatible_publish,
    )
    from pyspark.sql import functions as F

    root = str(tmp_path / "contract3")
    df1 = spark.createDataFrame([(1,)], "k long")
    compatible_publish(df1, root)
    df2 = df1.withColumn("req", F.lit(1))  # literal -> non-nullable
    assert not df2.schema["req"].nullable
    with _pytest.raises(SchemaCompatibilityError, match="non-nullable column added"):
        compatible_publish(df2, root)


def test_compatible_publish_schema_identical_republish(spark, tmp_path):
    """The two spurious-veto classes from review: (a) nested element
    nullability is force-nullabled by the parquet round trip, (b) an
    inferred partition column retypes (string day -> date). The schema
    manifest makes an unchanged-frame republish always legal."""
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        compatible_publish,
    )

    root = str(tmp_path / "repub")
    df = spark.createDataFrame([(1, "2024-01-05")], "k long, day string").withColumn(
        "arr", F.array(F.lit(1.0))
    )
    assert not df.schema["arr"].dataType.containsNull
    compatible_publish(df, root, partition_by=["day"])
    compatible_publish(df, root, partition_by=["day"])  # must not raise


def test_rollback_restores_previous_snapshot(spark, tmp_path):
    from udacity_dend_capstone_immigration_spark.sources.publish import (
        current_version,
        publish_table,
        read_published,
        rollback,
    )

    root = str(tmp_path / "rb")
    publish_table(spark.createDataFrame([(1,)], "k long"), root)
    v2 = publish_table(spark.createDataFrame([(1,), (2,)], "k long"), root)
    target = rollback(root)
    assert target != v2 and current_version(root) == target
    assert read_published(spark, root).count() == 1
    # rolled-to version is the newest history entry: a fresh publish
    # then time-travel -1 resolves IT, not the rolled-away v2
    publish_table(spark.createDataFrame([(9,), (8,), (7,)], "k long"), root)
    assert read_published(spark, root, version=-1).count() == 1


def test_rollback_without_previous_raises(spark, tmp_path):
    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        publish_table,
        rollback,
    )

    root = str(tmp_path / "rb2")
    publish_table(spark.createDataFrame([(1,)], "k long"), root)
    with _pytest.raises(FileNotFoundError, match="no previous"):
        rollback(root)


def test_publish_incident_drill_end_to_end(spark, tmp_path):
    """The full lifecycle in one sequence: good publish -> contract-
    vetoed publish (nothing staged, pointer intact) -> audit-vetoed
    publish (staged dir removed) -> good publish -> rollback -> the
    rolled-to state serves reads and the next publish builds on it."""
    import os

    import pytest as _pytest

    from udacity_dend_capstone_immigration_spark.sources.publish import (
        AuditFailedError,
        SchemaCompatibilityError,
        compatible_publish,
        current_version,
        read_published,
        rollback,
    )

    root = str(tmp_path / "drill")
    v1 = compatible_publish(spark.createDataFrame([(1, "a")], "k long, s string"), root)

    with _pytest.raises(SchemaCompatibilityError):
        compatible_publish(spark.createDataFrame([(1,)], "k long"), root)
    assert current_version(root) == v1

    def veto(df):
        raise ValueError("dq failed")

    with _pytest.raises(AuditFailedError):
        compatible_publish(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"),
            root,
            audit=veto,
        )
    assert current_version(root) == v1
    # the vetoed stage is gone: only v1's dir remains
    dirs = [d for d in os.listdir(root) if d.startswith("v_")]
    assert dirs == [v1]

    v2 = compatible_publish(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"), root
    )
    assert read_published(spark, root).count() == 2
    assert rollback(root) == v1
    assert read_published(spark, root).count() == 1
    v3 = compatible_publish(
        spark.createDataFrame([(9, "z")], "k long, s string"), root
    )
    assert current_version(root) == v3 and v3 not in (v1, v2)
    assert read_published(spark, root, version=-1).count() == 1


def test_manifest_lands_in_staged_dir_before_swap(spark, tmp_path):
    """r13 advice: the schema manifest must ride the staged version
    through the pointer swap — a post-swap write left a crash window
    where the live version was manifest-less and the next contract
    check fell back to the lossy read-back schema. Pin it: the pointer
    swap itself observes the manifest already in place, and a failing
    stage hook vetoes the publish like a failed audit."""
    import json
    import os

    import pytest

    from udacity_dend_capstone_immigration_spark.sources import publish as P

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")

    seen = {}
    real_replace = os.replace

    def spying_replace(src, dst):
        if os.path.basename(dst) == P._POINTER:
            with open(src) as fh:
                v = fh.read().strip()
            seen["manifest_at_swap"] = os.path.exists(
                os.path.join(root, v, P._SCHEMA_MANIFEST)
            )
        return real_replace(src, dst)

    os.replace = spying_replace
    try:
        v1 = P.compatible_publish(df, root)
    finally:
        os.replace = real_replace
    assert seen["manifest_at_swap"] is True
    with open(os.path.join(root, v1, P._SCHEMA_MANIFEST)) as fh:
        assert json.load(fh)["type"] == "struct"

    # a stage-hook failure vetoes: staged dir removed, live untouched
    def boom(staged_dir):
        raise RuntimeError("sidecar write failed")

    with pytest.raises(P.AuditFailedError, match="stage hook"):
        P.publish_table(df, root, stage_hook=boom)
    assert P.current_version(root) == v1
    orphans = [
        d for d in os.listdir(root)
        if d.startswith("v_") and d != v1 and os.path.isdir(os.path.join(root, d))
    ]
    assert orphans == []


def test_compatible_publish_chains_caller_stage_hook(spark, tmp_path):
    """r14 review fix: compatible_publish claims the stage_hook slot
    for its manifest — a caller's own sidecar hook must CHAIN (after
    the manifest write), not TypeError on the duplicate keyword."""
    import os

    from udacity_dend_capstone_immigration_spark.sources import publish as P

    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    calls = {}

    def sidecar(staged_dir):
        # the manifest is already in place when the caller hook runs
        calls["manifest_first"] = os.path.exists(
            os.path.join(staged_dir, P._SCHEMA_MANIFEST)
        )
        with open(os.path.join(staged_dir, "_sidecar"), "w") as fh:
            fh.write("x")

    v = P.compatible_publish(df, root, stage_hook=sidecar)
    assert calls["manifest_first"] is True
    assert os.path.exists(os.path.join(root, v, "_sidecar"))
    assert os.path.exists(os.path.join(root, v, P._SCHEMA_MANIFEST))
