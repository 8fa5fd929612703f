"""merge_upsert (MERGE INTO parity on partitioned parquet): value
semantics AND the rewrite-bound guarantee — untouched partition
directories must come through a merge byte-identical (same files, same
mtimes), because at 100 TB the whole point of MERGE over
read-modify-write is touching only the matched files."""

import os

import pytest

from udacity_dend_capstone_immigration_spark.sources.merge import merge_upsert
from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet


def _mkstore(spark, tmp_path):
    base = spark.createDataFrame(
        [
            (1, "a", 10.0, "p1"),
            (2, "b", 20.0, "p1"),
            (3, "c", 30.0, "p2"),
            (4, "d", 40.0, "p3"),
        ],
        "k long, s string, v double, pt string",
    )
    store = str(tmp_path / "store")
    write_parquet(base, store, partition_by=("pt",))
    return store


def _snapshot(store, part):
    d = os.path.join(store, f"pt={part}")
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
    }


def _rows(spark, store):
    return {
        tuple(r)
        for r in spark.read.parquet(store).select("k", "s", "v", "pt").collect()
    }


@pytest.fixture()
def store(spark, tmp_path):
    return _mkstore(spark, tmp_path)


def test_update_insert_and_partition_move(spark, store):
    updates = spark.createDataFrame(
        [
            (2, "B", 21.0, "p1"),   # in-place update
            (3, "C", 31.0, "p1"),   # partition move p2 -> p1
            (9, "new", 90.0, "p2"),  # insert
        ],
        "k long, s string, v double, pt string",
    )
    touched = merge_upsert(spark, store, updates, ("k",), "pt")
    assert touched == ["p1", "p2"]
    assert _rows(spark, store) == {
        (1, "a", 10.0, "p1"),
        (2, "B", 21.0, "p1"),
        (3, "C", 31.0, "p1"),  # exactly once, in its NEW partition
        (9, "new", 90.0, "p2"),
        (4, "d", 40.0, "p3"),
    }


def test_untouched_partition_files_not_rewritten(spark, store):
    before = _snapshot(store, "p3")
    assert before
    updates = spark.createDataFrame(
        [(1, "A", 11.0, "p1")], "k long, s string, v double, pt string"
    )
    touched = merge_upsert(spark, store, updates, ("k",), "pt")
    assert touched == ["p1"]
    assert _snapshot(store, "p3") == before


def test_remerge_is_idempotent(spark, store):
    updates = spark.createDataFrame(
        [(2, "B", 21.0, "p2"), (9, "new", 90.0, "p3")],
        "k long, s string, v double, pt string",
    )
    merge_upsert(spark, store, updates, ("k",), "pt")
    first = _rows(spark, store)
    merge_upsert(spark, store, updates, ("k",), "pt")
    assert _rows(spark, store) == first
