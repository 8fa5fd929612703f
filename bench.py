"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Runs each headline query end-to-end (noop sink — full computation, no
driver-side materialization), ``SPARK_GRAFT_BENCH_REPS`` (default 2)
times each, and prints ONE JSON line with the per-query MIN:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ..., "reps": N, "wall_sec": ...}`` — min-of-reps makes the
per-query numbers protocol-comparable with BASELINE.md's min-of-3
records instead of noisy first-execution readings.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_REPS (default 2).

Load-contamination canary (r15 verdict item 3): the driver's bench
runs after session close, and twice now an external-load episode
inflated every reading 1.3-2.5x, generating 10-15 false flags a human
had to adjudicate from load-average forensics. The JSON therefore also
carries ``canary_sec`` — min-of-3 of a FIXED, SF-independent,
CPU-bound Spark job (xxhash64(md5(id)) over a 64M-row range, all
cores — md5 makes it genuinely CPU-dominated; a bare range+hash scan
is scheduler-overhead-bound and insensitive to core contention) timed
after warmup — and ``load_avg`` (os.getloadavg at suite start).
tools/check_regressions.py compares the canary against its BASELINE.md
record and prints a contamination banner instead of failing the check
when the canary itself is inflated: same plan + same data + slow
canary = slow box, not a regression.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from udacity_dend_capstone_immigration_spark.session import get_spark_session
from udacity_dend_capstone_immigration_spark.workload import QUERIES

#: Representative spread: star joins, heavy TPC-H join shapes, heavy
#: aggregate, window functions, dedup ladder, text scoring, event
#:  windows, vector search. Rotated r8: tpch_q7/q9/q21 +
#: doc_lm_likelihood in (the round-7 TPC-H tier was unexercised by the
#: per-round bench), top_customers_per_nation / dedup_exact_docs /
#: events_hourly_by_type / dedup_substring_runs out (cheap or
#: coverage-duplicated by remaining entries; all stay oracle-gated).
#: Rotated r9: events_stream_sessions in (the 9-query streaming tier
#: was exercised by a single headliner) and
#: semantic_dedup_representatives in (the heaviest registry query —
#: checkpointed single assignment + skew-capped Arrow per-cell gram
#: this round; tracking it per-round keeps the embeddings tier honest).
#: Rotated r10: knn_ivfpq in (the compressed IVF-PQ serving path —
#: asymmetric scoring over 4-byte codes is the 100 TB store shape) and
#: documents_stream_dedup_status in (streaming incremental text dedup —
#: the ingestion-time classification pipeline); nothing out.
#: Rotated r11: knn_ivfpq_served in (top-k from the PERSISTED IVF-PQ
#: index — the warmup pre-builds it once, so this row is pure serve
#: latency, the number a train-once/serve-many store actually pays
#: per query) and bpe_encode_corpus in (the tokenizer train→encode
#: loop closed — corpus token histogram under the trained merges);
#: nothing out.
#: Rotated r12: knn_ivf_served in (the exact-scoring persisted-store
#: path named the production serving choice on this corpus) and
#: knn_sq8_served in (the new byte-code compressed default — recall
#: matches flat at 4× less store than float32); nothing out. The
#: warmup pre-builds all three served layouts, so these rows are pure
#: serve latency. Added late-r12: retrieval_hybrid_rrf (the fused
#: sparse+dense retrieval path — BM25 + dense arms and the RRF tail in
#: one number) and knn_ivf_filtered_served (metadata-filtered serving
#: from the attribute-carrying store; the warmup pre-builds its
#: flat_label layout too); nothing out.
#: Rotated r13: corpus_examples_packed_served in (the tokenizer
#: store's production artifact — packed examples with zero training
#: rounds; warmup pre-builds the BPE store) and
#: dedup_incremental_status_served in (batch classify against the
#: persisted text-dedup store — the serving path the r13 store tier
#: exists for); nothing out.
#: Rotated r13 session 2: tpch_q2_min_cost_supplier in (the derived-
#: partsupp correlated-minimum — the heaviest of the five shapes that
#: completed the 22-query TPC-H suite) and tpch_q5_local_supplier_volume
#: in (the cyclic join graph); nothing out.
#: Rotated r13 session 3: retrieval_mmr_diverse in (the RAG diversity
#: rerank between ANN and the context window — corpus-size-free greedy
#: stage over the Arrow top-k), publish_version_diff in (CDF-style
#: snapshot diff over the WAP store: two publishes + a key-partitioned
#: full-outer SMJ, the lake-maintenance shape), and
#: events_pit_feature_assembly in (leakage-free PIT feature assembly —
#: one cumulative user window over the full event table); nothing out.
#: Rotated r14: corpus_pipeline_served in (the end-to-end store-served
#: composition — dedup-store classify -> DSIR select -> BPE encode+pack
#: with zero training in the plan; its three stores are shared with
#: the other served headliners, so min-of-reps reads pure serve cost);
#: nothing out.
#: Rotated r15: doc_chunking in (the zero-shuffle RAG chunking map
#: pass — tracking the no-Exchange claim per-round is free at 0.7s)
#: and retrieval_hybrid_rrf's dense arm moved to the Arrow kernel
#: (same headliner, new 0.85 record); nothing out.
#: Suite totals are NOT comparable across rotations — BASELINE.md
#: records the discontinuity.
HEADLINE = [
    "top_nations_by_orders",
    "pricing_summary",
    "fact_denormalize",
    "tpch_q7_nation_trade_volume",
    "tpch_q9_profit_by_nation_year",
    "tpch_q21_waiting_suppliers",
    "tpch_q2_min_cost_supplier",
    "tpch_q5_local_supplier_volume",
    "doc_fingerprints",
    "dedup_minhash_lsh",
    "dedup_winnowing_overlap",
    "doc_repetition_scores",
    "doc_lm_likelihood",
    "events_sessionize",
    "knn_brute_force",
    "knn_brute_force_arrow",
    "embedding_near_dup",
    "semantic_dedup_representatives",
    "corpus_token_packing",
    "multimodal_decode",
    "events_stream_hourly",
    "events_stream_sessions",
    "knn_ivfpq",
    "documents_stream_dedup_status",
    "knn_ivfpq_served",
    "bpe_encode_corpus",
    "knn_ivf_served",
    "knn_sq8_served",
    "retrieval_hybrid_rrf",
    "knn_ivf_filtered_served",
    "corpus_examples_packed_served",
    "dedup_incremental_status_served",
    "retrieval_mmr_diverse",
    "publish_version_diff",
    "events_pit_feature_assembly",
    "corpus_pipeline_served",
    "doc_chunking",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark_session(
        app_name="udacity-dend-capstone-immigration-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # size the single local JVM like a real executor: 32 task
            # threads sharing the default 1g heap OOM on the r8
            # sort-merge verify joins (32 concurrent sorts + pinned
            # checkpoint blocks); any real deployment sizes the JVM to
            # its core count — ~256m/thread here, box has 128 GiB
            "spark.driver.memory": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM/codegen spin-up and one scan per input so query 1's
    # timing isn't session bootstrap. Not a dry run of the suite — each
    # query still pays its own planning/codegen below.
    spark.range(1_000_000).select(F.sum("id")).collect()
    # HotSpot JIT warmup for the expression hot loops the dedup tier
    # leans on (md5 / conv / modular arithmetic, zip-slice shingle
    # explode, wide min-aggregates + collect_set, grouped pair
    # generation) — all on SYNTHETIC range data, no headline query or
    # real input touched. Without this the first wide-aggregate query
    # absorbs ~2-4s of interpreter-tier execution before C2 kicks in
    # (measured: cold dedup_minhash_lsh 6.7s → 4.3s with this block),
    # which is bootstrap cost, not query cost — same rationale as the
    # streaming-machinery warmup below.
    wbase = spark.range(400_000).select(
        (F.col("id") % 2000).alias("k"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )
    wh1 = F.conv(F.substring("h", 1, 8), 16, 10).cast("bigint")
    wh2 = F.conv(F.substring("h", 9, 8), 16, 10).cast("bigint")
    wmins = [
        F.min((wh1 + F.lit(i) * wh2) % F.lit(4294967291)).alias(f"m{i}") for i in range(16)
    ]
    (
        wbase.groupBy("k")
        .agg(*wmins, F.array_sort(F.collect_set("h")).alias("s"))
        .write.format("noop").mode("overwrite").save()
    )
    wtok = spark.range(5_000).select(
        F.col("id"), F.split(F.md5(F.col("id").cast("string")), "").alias("t")
    )
    wsh = [F.col("t")] + [
        F.slice("t", k + 1, F.greatest(F.size("t") - k, F.lit(0))) for k in (1, 2)
    ]
    wz = F.arrays_zip(*[c.alias(f"c{i}") for i, c in enumerate(wsh)])
    wex = (
        wtok.select("id", F.explode(wz).alias("s"))
        .where(F.col("s.c2").isNotNull())
        .select("id", F.md5(F.concat_ws(" ", "s.c0", "s.c1", "s.c2")).alias("g"))
    )
    wgrp = wex.groupBy("g").agg(F.collect_set("id").alias("ids"))
    # df cap keeps the synthetic pair fan-out tiny (hex n-grams collide
    # heavily — the exact mega-bucket shape the dedup caps guard against)
    wgrp = wgrp.where((F.size("ids") >= 2) & (F.size("ids") <= 4))
    (
        wgrp.select(F.explode("ids").alias("a"), "ids")
        .select("a", F.explode("ids").alias("b"))
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b").count()
        .write.format("noop").mode("overwrite").save()
    )
    # spin up the Python worker pool so the first mapInPandas query
    # doesn't absorb it
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()
    # spin up the streaming machinery (micro-batch scheduler, state
    # store provider, checkpoint IO) on a 5-row stream so the first
    # streaming query doesn't absorb it (~1.5s measured)
    import uuid

    from udacity_dend_capstone_immigration_spark.streaming import (
        scratch_checkpoint_dir,
    )

    try:
        tiny = (
            spark.readStream.schema("r_regionkey long, r_name string, r_comment string")
            .option("pathGlobFilter", "region.parquet")
            .parquet(sf_dir)
            .groupBy("r_name")
            .count()
        )
        (
            tiny.writeStream.format("memory")
            .queryName(f"warmup_{uuid.uuid4().hex[:8]}")
            .outputMode("complete")
            # same scratch placement the memory-sink drains use (r17),
            # so the warmup spins the machinery up in the mode the
            # timed queries actually run; untimed region either way
            .option("checkpointLocation", scratch_checkpoint_dir("ck_warmup_"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )
    except Exception:
        pass
    from udacity_dend_capstone_immigration_spark.workload.base import read_events

    for name in ("lineitem", "orders", "customer", "nation", "region", "part",
                 "supplier", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").limit(1).count()
    # events' ts physical type varies by testdata generation: warm via
    # read_events (probes the footer, sets the confs it needs) so the
    # warmup emits no swallowed ERROR stack
    read_events(spark, sf_dir).limit(1).count()
    # Pre-build the persisted indexes so the *_served headliners
    # measure SERVE latency — the train-once/serve-many contract those
    # queries exist to prove (the build cost is the same training the
    # knn_ivfpq headliner already times inline every run; build-side
    # records live in BASELINE.md's extrapolation tables).
    from udacity_dend_capstone_immigration_spark.workload.vectors import served_index_dir

    served_index_dir(spark, sf_dir)
    served_index_dir(spark, sf_dir, kind="flat")
    served_index_dir(spark, sf_dir, kind="sq8")
    served_index_dir(spark, sf_dir, kind="flat_label")
    # r13: the TEXT-dedup store joins the pre-built set, so
    # documents_stream_dedup_status measures serve latency too (its
    # index rebuild was 124s of the 144s wall at the 100x corpus)
    from udacity_dend_capstone_immigration_spark.workload.dedupstore import served_dedup_index_dir

    served_dedup_index_dir(spark, sf_dir)
    from udacity_dend_capstone_immigration_spark.workload.pretrain import served_bpe_dir

    served_bpe_dir(spark, sf_dir)

    # Min-of-REPS per headliner (r10 verdict "What's wrong #3"): a
    # single reading is 1.25-1.55x the min-of-3 protocol the records
    # table uses (first-execution planning/codegen + suite JIT/GC
    # state), so single-run BENCH numbers generated a recurring
    # flag-triage tax every round. Two back-to-back executions of the
    # same plan make the reported number protocol-comparable with the
    # records at 2x suite wall-clock; wall_sec keeps the all-reps total.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))

    # Calibration canary: fixed CPU-bound work (no IO, no SF input) on
    # every core, AFTER warmup so JIT state is steady. One untimed rep
    # absorbs first-execution codegen; min-of-3 matches the records
    # protocol. On a quiet box this reads its BASELINE.md record;
    # under external load it inflates with everything else and
    # check_regressions annotates the run instead of flagging queries.
    load_avg = [round(x, 2) for x in os.getloadavg()]

    def _canary_once() -> float:
        t0 = time.time()
        spark.range(0, 64_000_000, 1, cpus).select(
            F.sum(F.xxhash64(F.md5(F.col("id").cast("string"))))
        ).collect()
        return time.time() - t0

    _canary_once()
    canary_sec = round(min(_canary_once() for _ in range(3)), 3)

    timings: dict[str, float] = {}
    wall0 = time.time()
    for name in HEADLINE:
        fn = QUERIES[name]
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    wall = round(time.time() - wall0, 3)

    total = round(sum(timings.values()), 3)
    # Drain streaming machinery BEFORE spark.stop(): availableNow queries
    # have terminated, but state-store maintenance / last-task teardown
    # can race the context shutdown and spew benign-but-alarming
    # DAGScheduler "non-existent accumulator" stacks into the tail
    # (BENCH_r05). Stop anything still active, then silence the logger
    # for the shutdown itself.
    for q in spark.streams.active:
        try:
            q.stop()
            q.awaitTermination(30)
        except Exception:
            pass
    spark.sparkContext.setLogLevel("OFF")
    # stop FIRST: the JVM occasionally emits async unified-logging lines
    # (e.g. [gc,alloc] warnings) on the shared stdout; printing after
    # shutdown guarantees the JSON is the final line for line-tailing
    # consumers
    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline_suite_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": reps,
                "wall_sec": wall,
                "canary_sec": canary_sec,
                "load_avg": load_avg,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
