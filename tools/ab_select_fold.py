"""Interleaved A/B: corpus_pipeline_served with the estimate-gated
one-job fold (no intermediate decision-frame checkpoints, window-shape
select) vs the shipped r16/r17-s1 shape (surv + scores checkpoints,
range-shape select). One session, bench.py's config, stores pre-built so
every rep is pure serve cost; arms alternate within each rep. Asserts
the two arms' full result rows are identical before timing counts.

Usage: python tools/ab_select_fold.py [--sf-dir DIR] [--reps 4] [--big]
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
        app_name="ab-select-fold", master="local[32]",
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

    # result-identity gate before any timing
    rows = {}
    for mode, key in ((True, "fold"), (False, "ship")):
        P._FOLD_SELECT_OVERRIDE = mode
        rows[key] = sorted(map(tuple, fn(spark, args.sf_dir).collect()))
    assert rows["fold"] == rows["ship"], "arms disagree — fold is WRONG"
    print(json.dumps({"identical_rows": len(rows["fold"])}), flush=True)

    res = {"fold": [], "ship": []}
    for rep in range(args.reps):
        for mode, key in ((True, "fold"), (False, "ship")):
            P._FOLD_SELECT_OVERRIDE = mode
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            res[key].append(round(time.time() - t0, 3))
            print(json.dumps({key: res[key][-1], "rep": rep}), flush=True)
    P._FOLD_SELECT_OVERRIDE = None
    spark.stop()
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "fold": res["fold"], "fold_min": min(res["fold"]),
        "ship": res["ship"], "ship_min": min(res["ship"]),
        "load_avg": [round(x, 2) for x in os.getloadavg()],
    }), flush=True)


if __name__ == "__main__":
    main()
