"""Interleaved A/B: classify_batch_against_index join strategy.

Arms (alternating per rep so box drift hits both equally):
  merge        — the shipped shape (merge-hinted SMJ: batch shingles ⋈
                 capped postings, and the na join)
  shuffle_hash — same joins hinted SHUFFLE_HASH (guide §3.1: no sort of
                 the corpus-scaled postings side per serve; build side =
                 the smaller per-partition relation). r16 only ever
                 A/B'd shuffle_hash bundled WITH the grouped-array
                 carry; this isolates the join strategy on the shipped
                 flat rows.

Runs at sf0.1 and (if present) the x100 extrapolation corpus — a
local-only win doesn't count (CLAUDE.md).

Usage: python tools/ab_classify_join.py [--reps 3] [--skip-x100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-x100", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from udacity_dend_capstone_immigration_spark.session import get_spark_session
    from udacity_dend_capstone_immigration_spark.workload import dedupstore as D
    from udacity_dend_capstone_immigration_spark.workload.base import table

    spark = get_spark_session(
        app_name="ab-classify-join",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.memory": "64g",
            "spark.driver.maxResultSize": "8g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    sf_dirs = ["/root/testdata/sf0.1"]
    if not args.skip_x100 and os.path.isdir("/tmp/dedup_extrap/x100"):
        sf_dirs.append("/tmp/dedup_extrap/x100")

    orig_hint = D._CLASSIFY_JOIN_HINT
    out: dict = {}
    for sf_dir in sf_dirs:
        idx = D.served_dedup_index_dir(spark, sf_dir)  # build once, untimed
        docs = table(spark, sf_dir, "documents")
        batch = docs.where(F.col("doc_id") % D._INC_MOD == 0)
        res = {"merge": [], "shuffle_hash": []}
        for _ in range(args.reps):
            for arm in ("merge", "shuffle_hash"):
                D._CLASSIFY_JOIN_HINT = arm
                spark.sparkContext.setJobDescription(f"classify [{arm}] {sf_dir}")
                t0 = time.time()
                D.classify_batch_against_index(spark, idx, batch).write.format(
                    "noop"
                ).mode("overwrite").save()
                res[arm].append(round(time.time() - t0, 3))
        D._CLASSIFY_JOIN_HINT = orig_hint
        out[sf_dir] = {
            a: {"reps": v, "min": min(v)} for a, v in res.items()
        }
        print(json.dumps({sf_dir: out[sf_dir]}), flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
