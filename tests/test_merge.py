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


def test_delete_only_merge(spark, store):
    dels = spark.createDataFrame([(2,), (999,)], "k long")  # 999 = no-op
    touched = merge_upsert(
        spark,
        store,
        spark.createDataFrame([], "k long, s string, v double, pt string"),
        ("k",),
        "pt",
        deletes=dels,
    )
    assert touched == ["p1"]
    assert _rows(spark, store) == {
        (1, "a", 10.0, "p1"),
        (3, "c", 30.0, "p2"),
        (4, "d", 40.0, "p3"),
    }


def test_apply_cdc_resolution_and_delete_wins(spark, store):
    from udacity_dend_capstone_immigration_spark.sources.merge import apply_cdc

    batch = spark.createDataFrame(
        [
            # key 1: update then LATER delete -> delete wins
            (1, "A", 11.0, "p1", "U", 1),
            (1, "A", 11.0, "p1", "D", 2),
            # key 2: two updates -> highest seq wins
            (2, "b1", 21.0, "p1", "U", 1),
            (2, "b2", 22.0, "p1", "U", 2),
            # key 3: delete then LATER re-insert -> insert wins
            (3, "c", 30.0, "p2", "D", 1),
            (3, "c2", 33.0, "p2", "I", 2),
            # key 9: plain insert
            (9, "new", 90.0, "p3", "I", 1),
        ],
        "k long, s string, v double, pt string, op string, seq int",
    )
    apply_cdc(spark, store, batch, ("k",), "pt")
    assert _rows(spark, store) == {
        (2, "b2", 22.0, "p1"),
        (3, "c2", 33.0, "p2"),
        (4, "d", 40.0, "p3"),
        (9, "new", 90.0, "p3"),
    }


def test_apply_cdc_seq_tie_breaks_toward_delete(spark, store):
    from udacity_dend_capstone_immigration_spark.sources.merge import apply_cdc

    batch = spark.createDataFrame(
        [(2, "b", 21.0, "p1", "U", 5), (2, "b", 21.0, "p1", "D", 5)],
        "k long, s string, v double, pt string, op string, seq int",
    )
    apply_cdc(spark, store, batch, ("k",), "pt")
    assert 2 not in {r[0] for r in _rows(spark, store)}


def test_stable_partitions_fast_path(spark, store):
    import pytest

    updates = spark.createDataFrame(
        [(2, "B", 21.0, "p1"), (9, "new", 90.0, "p2")],
        "k long, s string, v double, pt string",
    )
    touched = merge_upsert(
        spark, store, updates, ("k",), "pt", assume_stable_partitions=True
    )
    assert touched == ["p1", "p2"]
    assert _rows(spark, store) == {
        (1, "a", 10.0, "p1"),
        (2, "B", 21.0, "p1"),
        (3, "c", 30.0, "p2"),
        (9, "new", 90.0, "p2"),
        (4, "d", 40.0, "p3"),
    }
    # deletes without the partition column cannot be located under the
    # stable-partitions contract — loud error, not silent staleness
    with pytest.raises(ValueError):
        merge_upsert(
            spark,
            store,
            updates.limit(0),
            ("k",),
            "pt",
            deletes=spark.createDataFrame([(2,)], "k long"),
            assume_stable_partitions=True,
        )


def test_emptied_partition_does_not_resurrect(spark, store):
    # delete EVERY row of p2 -> the partition dir must actually empty
    dels = spark.createDataFrame([(3,)], "k long")
    merge_upsert(
        spark,
        store,
        spark.createDataFrame([], "k long, s string, v double, pt string"),
        ("k",),
        "pt",
        deletes=dels,
    )
    assert _rows(spark, store) == {
        (1, "a", 10.0, "p1"),
        (2, "b", 20.0, "p1"),
        (4, "d", 40.0, "p3"),
    }


def test_partition_move_empties_source_partition(spark, store):
    # p2's ONLY row moves to p1: the old copy must not remain in p2
    updates = spark.createDataFrame(
        [(3, "C", 31.0, "p1")], "k long, s string, v double, pt string"
    )
    merge_upsert(spark, store, updates, ("k",), "pt")
    rows = _rows(spark, store)
    assert (3, "C", 31.0, "p1") in rows
    assert not any(r[0] == 3 and r[3] == "p2" for r in rows)
    assert len([r for r in rows if r[0] == 3]) == 1


def test_bootstrap_probe_does_not_mask_read_errors(spark, tmp_path):
    import pytest

    # a NON-empty store dir whose contents are unreadable must raise,
    # never silently bootstrap-overwrite the store with the batch
    bad = tmp_path / "badstore"
    bad.mkdir()
    (bad / "pt=p1").mkdir()
    (bad / "pt=p1" / "garbage.parquet").write_bytes(b"not a parquet file")
    upd = spark.createDataFrame(
        [(1, "a", 1.0, "p1")], "k long, s string, v double, pt string"
    )
    with pytest.raises(Exception):
        merge_upsert(spark, str(bad), upd, ("k",), "pt")
    assert (bad / "pt=p1" / "garbage.parquet").exists()  # store untouched


def test_null_partition_value_rejected_before_any_write(spark, store):
    # r12 advice: a NULL partition value used to TypeError inside
    # sorted() mid-merge (and would silently go stale in the kept
    # filter). Now it raises a clear contract error BEFORE the write.
    before = _rows(spark, store)
    upd = spark.createDataFrame(
        [(2, "B", 21.0, None)], "k long, s string, v double, pt string"
    )
    with pytest.raises(ValueError, match="NULL value in partition column"):
        merge_upsert(spark, store, upd, ("k",), "pt")
    assert _rows(spark, store) == before  # store untouched


def test_null_partition_rejected_on_bootstrap_too(spark, tmp_path):
    target = tmp_path / "nullboot"
    upd = spark.createDataFrame(
        [(1, "a", 1.0, None)], "k long, s string, v double, pt string"
    )
    with pytest.raises(ValueError, match="NULL value in partition column"):
        merge_upsert(spark, str(target), upd, ("k",), "pt")
    import os as _os

    assert not _os.path.isdir(str(target)) or not _os.listdir(str(target))


def test_large_key_batch_falls_back_to_shuffled_join(spark, store, monkeypatch):
    # r12 advice: F.broadcast(keys) was unconditional (O(CDC batch)).
    # Force the fallback by shrinking the cap and verify the merge is
    # still value-correct through the merge-hinted join path.
    import udacity_dend_capstone_immigration_spark.sources.merge as M

    monkeypatch.setattr(M, "MAX_BROADCAST_MERGE_KEYS", 0)
    updates = spark.createDataFrame(
        [(2, "B", 21.0, "p1"), (3, "C", 31.0, "p1"), (9, "new", 90.0, "p2")],
        "k long, s string, v double, pt string",
    )
    touched = merge_upsert(spark, store, updates, ("k",), "pt")
    assert touched == ["p1", "p2"]
    rows = _rows(spark, store)
    assert (2, "B", 21.0, "p1") in rows and (3, "C", 31.0, "p1") in rows
    assert (9, "new", 90.0, "p2") in rows
    assert not any(r[0] == 3 and r[3] == "p2" for r in rows)


# ---- SCD2 apply ----


def _scd2_store(spark, tmp_path):
    import datetime as dt

    from udacity_dend_capstone_immigration_spark.sources.writers import write_parquet

    base = spark.createDataFrame(
        [
            (1, "A", dt.date(1992, 1, 1), None, True, 1992),
            (2, "B", dt.date(1993, 6, 1), None, True, 1993),
            (3, "C", dt.date(1994, 2, 1), None, True, 1994),
        ],
        "k long, attr string, valid_from date, valid_to date,"
        " is_current boolean, valid_yr int",
    )
    store = str(tmp_path / "scd2")
    write_parquet(base, store, partition_by=("valid_yr",))
    return store


def test_scd2_multi_change_chain_and_untouched_partition(spark, tmp_path):
    import datetime as dt

    from udacity_dend_capstone_immigration_spark.sources.merge import scd2_apply

    store = _scd2_store(spark, tmp_path)
    before_1994 = _snapshot_dir(store, "valid_yr=1994")
    changes = spark.createDataFrame(
        [
            (1, "A2", dt.date(1995, 3, 1)),   # two changes for key 1 in
            (1, "A3", dt.date(1996, 7, 1)),   # ONE batch -> chained
            (9, "NEW", dt.date(1995, 5, 5)),  # brand-new key: insert only
        ],
        "k long, attr string, ts date",
    )
    touched = scd2_apply(spark, store, changes, ("k",), "ts")
    assert touched == [1992, 1995, 1996]  # 1993/1994 never rewritten
    rows = {
        (r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in spark.read.parquet(store).collect()
    }
    assert (1, "A", "1992-01-01", "1995-03-01", False) in rows   # closed
    assert (1, "A2", "1995-03-01", "1996-07-01", False) in rows  # chained
    assert (1, "A3", "1996-07-01", "None", True) in rows         # current
    assert (9, "NEW", "1995-05-05", "None", True) in rows        # new key
    assert (2, "B", "1993-06-01", "None", True) in rows          # untouched
    assert (3, "C", "1994-02-01", "None", True) in rows
    # exactly one current row per key
    cur = [r for r in rows if r[4]]
    assert sorted(k for k, *_ in cur) == [1, 2, 3, 9]
    # the untouched partition's files are byte-identical (same mtimes)
    assert _snapshot_dir(store, "valid_yr=1994") == before_1994


def _snapshot_dir(store, part):
    d = os.path.join(store, part)
    return {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
    }


def test_scd2_null_ts_rejected(spark, tmp_path):
    from udacity_dend_capstone_immigration_spark.sources.merge import scd2_apply

    store = _scd2_store(spark, tmp_path)
    changes = spark.createDataFrame(
        [(1, "X", None)], "k long, attr string, ts date"
    )
    with pytest.raises(ValueError, match="NULL value in partition column"):
        scd2_apply(spark, store, changes, ("k",), "ts")


def test_scd2_rejects_out_of_order_change(spark, tmp_path):
    """Review finding: a change ts BEFORE the key's current valid_from
    would silently write a negative interval — must raise instead."""
    import datetime as dt

    from udacity_dend_capstone_immigration_spark.sources.merge import scd2_apply

    store = _scd2_store(spark, tmp_path)  # key 3 current since 1994-02-01
    late = spark.createDataFrame(
        [(3, "LATE", dt.date(1993, 1, 1))], "k long, attr string, ts date"
    )
    before = {
        tuple(r) for r in spark.read.parquet(store).select("k", "attr").collect()
    }
    with pytest.raises(ValueError, match="late/out-of-order"):
        scd2_apply(spark, store, late, ("k",), "ts")
    after = {
        tuple(r) for r in spark.read.parquet(store).select("k", "attr").collect()
    }
    assert after == before  # store untouched
    # equal ts is LEGAL (zero-length version), not out-of-order
    same_day = spark.createDataFrame(
        [(3, "SAME", dt.date(1994, 2, 1))], "k long, attr string, ts date"
    )
    scd2_apply(spark, store, same_day, ("k",), "ts")
    rows = {
        (r["k"], r["attr"], str(r["valid_to"]), r["is_current"])
        for r in spark.read.parquet(store).collect()
    }
    assert (3, "C", "1994-02-01", False) in rows
    assert (3, "SAME", "None", True) in rows
