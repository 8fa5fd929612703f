"""Interleaved A/B: corpus_pipeline_served with the classify/score jobs
overlapped (2-thread pool, guide §2.6) vs sequential — the r16 verdict's
item 1. One session, bench.py's config, stores pre-built so every rep is
pure serve cost; the two arms alternate within each rep so box drift
hits both equally. min-of-reps per arm decides.

Usage: python tools/ab_pipeline_overlap.py [--sf-dir DIR] [--reps 4] [--big]
(--big sizes the session for the x100 extrapolation corpus)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from udacity_dend_capstone_immigration_spark.session import get_spark_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--big", action="store_true")
    args = ap.parse_args()

    extra = {"spark.ui.showConsoleProgress": "false", "spark.driver.memory": "8g"}
    if args.big:
        extra["spark.driver.memory"] = "64g"
        extra["spark.driver.maxResultSize"] = "8g"
    spark = get_spark_session(
        app_name="ab-pipeline-overlap", master="local[32]",
        shuffle_partitions=32, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).select(F.sum("id")).collect()
    spark.range(64).repartition(8).mapInPandas(lambda it: it, "id long").count()

    from udacity_dend_capstone_immigration_spark.workload import pipeline as P
    from udacity_dend_capstone_immigration_spark.workload import QUERIES
    from udacity_dend_capstone_immigration_spark.workload.dedupstore import (
        served_dedup_index_dir,
    )
    from udacity_dend_capstone_immigration_spark.workload.pretrain import served_bpe_dir
    from udacity_dend_capstone_immigration_spark.workload.textops import served_dsir_dir

    served_dedup_index_dir(spark, args.sf_dir)
    served_dsir_dir(spark, args.sf_dir)
    served_bpe_dir(spark, args.sf_dir)

    fn = QUERIES["corpus_pipeline_served"]
    res = {"overlap": [], "sequential": []}
    for rep in range(args.reps):
        for mode, key in ((True, "overlap"), (False, "sequential")):
            P._OVERLAP_JOBS = mode
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            res[key].append(round(time.time() - t0, 3))
            print(json.dumps({key: res[key][-1], "rep": rep}), flush=True)
    spark.stop()
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "overlap": res["overlap"], "overlap_min": min(res["overlap"]),
        "sequential": res["sequential"], "sequential_min": min(res["sequential"]),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }), flush=True)


if __name__ == "__main__":
    main()
