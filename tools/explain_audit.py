"""Plan-quality audit across the query registry.

Prints one line per query: parquet scans, shuffle exchanges, broadcast
exchanges, Python boundaries (vectorized vs row-at-a-time), cartesian
products — the numbers that decide whether a plan survives a 100x
scale-up. Streaming / executing queries are skipped (their plan is
drained at build time).

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

from udacity_dend_capstone_immigration_spark.session import get_spark_session  # noqa: E402
from udacity_dend_capstone_immigration_spark.workload import QUERIES  # noqa: E402

SKIP_PREFIXES = ("events_stream_",)
SKIP = {
    "partitioned_write_roundtrip",
    "dedup_clusters",
    "dedup_keep_best",
    "doc_pagerank_near_dup",
    "immigration_etl_fact",
    "immigration_etl_city_demographics",
    # r13 executing roundtrips (store builds/appends run at plan time)
    "dedup_index_build_roundtrip",
    "dedup_index_append_roundtrip",
    "dedup_index_fold_roundtrip",
    "documents_stream_index_append",
}


def audit(plan: str) -> dict[str, int]:
    return {
        # count numbered node headers only — explain("formatted") prints
        # every node once in the tree AND once in the detail list, so a
        # bare "Scan parquet" grep double-counts
        "scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", plan)),
        "reused": len(re.findall(r"ReusedExchange", plan)),
        "arrow_py": len(
            re.findall(r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython", plan)
        ),
        "row_py": len(re.findall(r"BatchEvalPython", plan)),
        "cartesian": len(re.findall(r"CartesianProduct", plan)),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    names = args[1:] or [
        n
        for n in QUERIES
        if not n.startswith(SKIP_PREFIXES) and n not in SKIP
    ]
    spark = get_spark_session(
        app_name="explain-audit", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    width = max(map(len, names)) + 2
    flagged = 0
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        a = audit(buf.getvalue())
        flags = []
        if a["row_py"]:
            flags.append("ROW-PYTHON")
        if a["cartesian"]:
            flags.append("CARTESIAN")
        if a["scans"] > 6:
            flags.append("MANY-SCANS")
        flagged += bool(flags)
        print(
            f"{name:<{width}} scans={a['scans']:<2} shuffles={a['exchanges']:<2} "
            f"bcast={a['broadcasts']:<2} reuse={a['reused']:<2} "
            f"arrowPy={a['arrow_py']:<2} {' '.join(flags)}"
        )
    print(f"\n{len(names)} plans audited, {flagged} flagged")


if __name__ == "__main__":
    main()
