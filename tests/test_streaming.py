"""Streaming layer: batch-parity of watermarked windows under
availableNow, multi-batch stateful operator, session windows."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from udacity_dend_capstone_immigration_spark.streaming import (
    read_stream,
    run_available_now,
    running_totals_stateful,
    session_window_agg,
    watermarked_tumbling,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def event_dir(spark, tmp_path_factory):
    """Two separate files → two micro-batches with maxFilesPerTrigger=1."""
    d = tmp_path_factory.mktemp("events_stream")
    rows1 = [
        (1, "2024-01-01 10:05:00", 1, "click", 1.0),
        (2, "2024-01-01 10:15:00", 1, "view", 2.0),
        (3, "2024-01-01 10:45:00", 2, "click", 3.0),
    ]
    rows2 = [
        (4, "2024-01-01 11:05:00", 1, "click", 4.0),
        (5, "2024-01-01 11:20:00", 2, "purchase", 5.0),
        (6, "2024-01-01 13:00:00", 2, "click", 6.0),
    ]
    for i, rows in enumerate((rows1, rows2)):
        df = spark.createDataFrame(
            [(e, __import__("datetime").datetime.fromisoformat(t), u, ty, v) for e, t, u, ty, v in rows],
            EVENTS_SCHEMA,
        )
        df.coalesce(1).write.parquet(str(d / f"batch{i}"))
    # flatten: move part files up so the source dir is one flat listing
    import shutil

    flat = tmp_path_factory.mktemp("events_flat")
    n = 0
    for sub in sorted(d.iterdir()):
        for f in sorted(sub.glob("*.parquet")):
            shutil.copy(f, flat / f"file{n}.parquet")
            n += 1
    return str(flat)


def test_tumbling_stream_equals_batch(spark, event_dir, tmp_path):
    stream = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    agg = watermarked_tumbling(
        stream, "ts", "1 hour", ["event_type"],
        [F.count(F.lit(1)).alias("event_cnt"), F.sum("value").alias("total_value")],
    )
    got = run_available_now(agg, "tumbling_test", checkpoint_dir=str(tmp_path / "ck"))

    batch = spark.read.schema(EVENTS_SCHEMA).parquet(event_dir)
    want = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_cnt"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "event_cnt",
            "total_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_stateful_running_totals_across_batches(spark, event_dir, tmp_path):
    stream = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    totals = running_totals_stateful(stream)
    got = run_available_now(
        totals, "stateful_test", output_mode="update", checkpoint_dir=str(tmp_path / "ck")
    )
    # update mode appends one row per (key, batch); the LAST emission per
    # key must equal the global batch aggregate — proving state carried
    # across micro-batches
    final = {
        r["user_id"]: (r["event_cnt"], r["total_value"])
        for r in got.orderBy("event_cnt").collect()
    }
    assert final[1] == (3, 7.0)
    assert final[2] == (3, 14.0)
    # and user 1 must have emitted an intermediate row in batch 1
    assert got.where("user_id = 1").count() == 2


def test_session_window_stream(spark, event_dir, tmp_path):
    stream = read_stream(spark, event_dir, EVENTS_SCHEMA)
    sess = session_window_agg(
        stream, "ts", "user_id", "30 minutes", [F.count(F.lit(1)).alias("event_cnt")]
    )
    got = run_available_now(sess, "session_test", checkpoint_dir=str(tmp_path / "ck"))
    rows = {(r["user_id"], r["event_cnt"]) for r in got.collect()}
    # user 1: events at 10:05, 10:15 (one session), 11:05 (new session)
    # user 2: 10:45, 11:20 merge? gap is 35min > 30 → separate; 13:00 separate
    assert (1, 2) in rows and (1, 1) in rows
    assert got.where("user_id = 2").count() == 3


def test_watermarked_dedup_across_batches(spark, event_dir, tmp_path):
    """Duplicates arriving in DIFFERENT micro-batches must still dedup —
    that's the state-store property (not just intra-batch distinct)."""
    from udacity_dend_capstone_immigration_spark.streaming import watermarked_dedup

    # two streams over the same files, unioned: every event id arrives
    # twice, and with maxFilesPerTrigger=1 arrivals straddle batches
    a = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    b = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    deduped = watermarked_dedup(a.unionByName(b), "ts", ["event_id"], watermark="10 hours")
    out = run_available_now(
        deduped, "dedup_t", output_mode="append",
        checkpoint_dir=str(tmp_path / "ck_dedup"),
    )
    ids = sorted(r["event_id"] for r in out.select("event_id").collect())
    assert ids == [1, 2, 3, 4, 5, 6]


def test_stream_stream_interval_join_across_batches(spark, event_dir, tmp_path):
    """The matching click (batch 1) and purchase (batch 2) arrive in
    different micro-batches — the pair can only come from buffered join
    state, not intra-batch matching."""
    from udacity_dend_capstone_immigration_spark.streaming import stream_interval_join

    def side(event_type, ts_name, cols):
        s = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
        return s.where(F.col("event_type") == event_type).select(
            F.col("ts").alias(ts_name), *cols
        )

    clicks = side("click", "click_ts", [F.col("user_id").alias("c_user")])
    purchases = side(
        "purchase", "purch_ts",
        [F.col("user_id").alias("p_user"), F.col("value").alias("p_value")],
    )
    pairs = stream_interval_join(
        clicks, "click_ts", purchases, "purch_ts",
        on=F.col("c_user") == F.col("p_user"),
        interval="1 HOUR", watermark="10 hours",
    )
    out = run_available_now(
        pairs, "attr_t", output_mode="append",
        checkpoint_dir=str(tmp_path / "ck_attr"),
    )
    got = [(r["c_user"], r["p_value"]) for r in out.collect()]
    # only user 2's 10:45 click has a purchase (11:20) within the hour
    assert got == [(2, 5.0)]


def test_foreach_batch_sink_multi_batch_and_replay(spark, event_dir, tmp_path):
    """foreachBatch parquet sink: two micro-batches land in two
    batch_id directories; re-running with the same checkpoint is a
    no-op (the backlog is already committed), so the landed dataset
    stays exactly-once."""
    from udacity_dend_capstone_immigration_spark.streaming import (
        run_foreach_batch_parquet,
    )

    out = str(tmp_path / "landed")
    ck = str(tmp_path / "ck")
    stream = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    sel = stream.select("event_id", "event_type", "value")
    run_foreach_batch_parquet(sel, out, ck, partition_by=("event_type",))

    landed = spark.read.parquet(out)
    assert landed.count() == 6
    assert {r.batch_id for r in landed.select("batch_id").distinct().collect()} == {0, 1}
    assert {r.event_id for r in landed.collect()} == {1, 2, 3, 4, 5, 6}

    # replay with the same checkpoint: nothing new to process, no dupes
    stream2 = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    run_foreach_batch_parquet(
        stream2.select("event_id", "event_type", "value"), out, ck,
        partition_by=("event_type",),
    )
    assert spark.read.parquet(out).count() == 6


def test_transform_with_state_gate_or_parity(spark, tmp_path):
    """Spark 4 transformWithState twin: runs and matches the
    applyInPandasWithState totals where protobuf is available; raises
    the documented capability error where it is not."""
    import pytest
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.streaming.stateful import (
        integer_totals_stateful,
        integer_totals_transform_with_state,
        transform_with_state_available,
    )
    from udacity_dend_capstone_immigration_spark.streaming.windows import (
        run_available_now,
    )
    from udacity_dend_capstone_immigration_spark.workload.base import read_events_stream

    ev = read_events_stream(spark, "/root/testdata/sf0.001")

    if not transform_with_state_available():
        with pytest.raises(RuntimeError, match="protobuf"):
            integer_totals_transform_with_state(ev)
        return

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    tws = run_available_now(
        integer_totals_transform_with_state(ev),
        "tws_totals_test",
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ck_tws"),
    )
    base = run_available_now(
        integer_totals_stateful(ev),
        "apws_totals_test",
        output_mode="update",
        checkpoint_dir=str(tmp_path / "ck_apws"),
    )
    assert sorted(map(tuple, tws.collect())) == sorted(map(tuple, base.collect()))


def test_stream_transitions_chain_across_batches(spark, tmp_path):
    """Two forced micro-batches (maxFilesPerTrigger=1): the pair that
    SPANS the batch boundary must still be counted — that's the state
    the operator exists to carry."""
    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.streaming.stateful import (
        transition_counts_stateful,
    )
    from udacity_dend_capstone_immigration_spark.streaming.windows import (
        read_stream,
        run_available_now,
    )
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    import shutil

    d = tmp_path / "stream_in"
    d.mkdir()
    for i, rows in enumerate(
        [
            [(0, 1000, 1, "view"), (1, 2000, 1, "click")],
            [(2, 3000, 1, "purchase"), (3, 4000, 2, "view")],
        ]
    ):
        staging = tmp_path / f"staging_{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.copy(part, d / f"b{i}.parquet")

    # stream the two directories' files one per trigger: boundary pair is
    # (click -> purchase), which exists in NEITHER single batch
    raw = read_stream(
        spark,
        str(d),
        schema,
        max_files_per_trigger=1,
        path_glob_filter="*.parquet",
    )
    pairs = transition_counts_stateful(raw)
    drained = run_available_now(
        pairs,
        "stream_transitions_xbatch",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    out = {
        (r["prev_type"], r["next_type"]): r["cnt"]
        for r in drained.groupBy("prev_type", "next_type")
        .agg(F.sum("pair_cnt").alias("cnt"))
        .collect()
    }
    assert out == {("view", "click"): 1, ("click", "purchase"): 1}


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """Late-data semantics, actually exercised: batch 1 advances the
    watermark far past an old window; batch 2 delivers a late event for
    that window. In append mode the late row must NOT resurrect the
    closed window — its count stays at the on-time value."""
    import shutil

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from udacity_dend_capstone_immigration_spark.streaming.windows import (
        read_stream,
        run_available_now,
        watermarked_tumbling,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_us", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    hour = 3_600_000_000
    # a batch's effective watermark is computed from the batch BEFORE
    # the previous one (one-batch computation lag + one-batch
    # application lag), so the straggler needs a filler batch between
    # the watermark-advancing event and its own arrival: batch 0 fills
    # hour-0; batch 1's hour-10 event raises the computed watermark;
    # batch 2 (filler) makes 9h effective and evicts hour-0 (cnt 2);
    # batch 3's hour-0 straggler is then dropped by the watermark
    # (numRowsDroppedByWatermark = 1 observed).
    batches = [
        [(0, 1 * hour // 2, "a"), (1, 1 * hour // 3, "a")],
        [(2, 10 * hour, "a")],
        [(4, 11 * hour, "a")],
        [(3, 1 * hour // 4, "a")],
    ]
    d = tmp_path / "late_stream"
    d.mkdir()
    import os

    for i, rows in enumerate(batches):
        staging = tmp_path / f"staging_{i}"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(staging))
        target = d / f"b{i}.parquet"
        shutil.copy(next(staging.glob("part-*.parquet")), target)
        # the file source orders by modification time: force distinct,
        # increasing mtimes so batch order matches intent
        os.utime(target, (1700000000 + i * 100, 1700000000 + i * 100))

    raw = read_stream(
        spark, str(d), schema, max_files_per_trigger=1, path_glob_filter="*.parquet"
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    agg = watermarked_tumbling(
        ev, "ts", "1 hour", ["event_type"], [F.count(F.lit(1)).alias("cnt")],
        watermark="1 hour",
    )
    out = run_available_now(
        agg,
        "late_drop_test",
        output_mode="append",
        checkpoint_dir=str(tmp_path / "ck"),
    )
    counts = {
        r["window_start"].hour: r["cnt"]
        for r in out.collect()
        if r["window_start"].year == 1970
    }
    # hour-0 window closed with exactly the 2 on-time events; the late
    # event (id 3) was dropped, not re-emitted
    assert counts.get(0) == 2


def test_stream_dedup_batch_finish_scan_count(spark):
    # Pin the r13 SERVED batch-finish shape: the corpus is NEVER
    # scanned in the final plan — corpus set sizes come from the
    # persisted store's doc_sizes relation, and since r16 the
    # arriving-batch set sizes ride through the streamed explode with
    # the drained pair table (``na``), so the ONLY documents.parquet
    # scan left is the status base (under the pushed doc_id%7=0
    # filter). The r11-era z-checkpoint (one full-corpus tokenize) is
    # gone with the inline rebuild itself; tests/test_dedupstore.py
    # additionally pins no collect_list (no inline index build).
    from udacity_dend_capstone_immigration_spark.workload import QUERIES

    df = QUERIES["documents_stream_dedup_status"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "FileScan" in ln and "documents.parquet" in ln
    ]
    assert len(scans) == 1, plan
    assert "doc_sizes" in plan, plan


def test_incremental_agg_merge_across_batches(spark, event_dir, tmp_path):
    """update-mode agg + foreachBatch merge: after a multi-batch drain
    the maintained table equals recomputing the aggregate from scratch
    — including user 1 and 2, whose totals SPAN batches and must be
    absolute (state-store) values, not per-batch deltas."""
    from udacity_dend_capstone_immigration_spark.sources.merge import merge_upsert

    stream = read_stream(spark, event_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    totals = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("tv_dec"),
    )
    store = str(tmp_path / "totals")
    batches = []

    def upsert(batch_df, batch_id):
        batches.append(batch_id)
        batch = batch_df.select(
            (F.col("user_id") % 2).alias("pt"), "user_id", "n_events", "tv_dec"
        )
        merge_upsert(batch_df.sparkSession, store, batch, ("user_id",), "pt")

    q = (
        totals.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination(120)
    assert len(batches) >= 2  # the backlog really straddled batches
    got = {
        (r["user_id"], r["n_events"], float(r["tv_dec"]))
        for r in spark.read.parquet(store).collect()
    }
    assert got == {(1, 3, 7.0), (2, 3, 14.0)}
