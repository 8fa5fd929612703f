"""Forced-broadcast discipline: every ``F.broadcast(...)`` in the
workload/plans tier must broadcast something BOUNDED — an SF-invariant
dim (nation/region, SAS label dims), a one-row/top-k aggregate, or a
contract-bounded query set. Broadcasting a table that scales with SF
(customer, supplier, part, orders, lineitem, document/embedding
corpora) is the 100×-scale-killer class the round-6/7 audits removed;
this test pins the fix so a future edit can't silently reintroduce one.

The check is intentionally textual (argument expression against an
allowlist) — plan-level inspection can't distinguish a hint-forced
broadcast from an AQE-chosen one, and the allowlist doubles as the
documented inventory of why each remaining broadcast is safe.
"""

from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "udacity_dend_capstone_immigration_spark"

#: argument-expression → why it is bounded. Adding a new F.broadcast()
#: requires adding a row here WITH its boundedness argument.
ALLOWED = {
    # SF-invariant dims (25 nations / 5 regions)
    "nation": "25 rows at any SF",
    "n1": "aliased nation copy",
    "n2": "aliased nation copy",
    "region": "5 rows at any SF",
    "region_nations": "nation⋈region (≤25 rows at any SF)",
    "nation7": "single-nation filter of the 25-row nation dim",
    # one-row / top-k / per-small-key aggregates
    "top": "top-k output, k fixed",
    "bm_stats": "one-row global BM25 stats aggregate (N, avgdl, per-term df)",
    "avg_bal": "one-row scalar aggregate",
    "avg_df": "one-row scalar aggregate",
    "n_docs": "one-row count",
    "ty": "one-row bigram-type total (Kneser-Ney continuation denominator)",
    "tot": "one-row total",
    "xp": "one-row crossing-pair count (cluster-safe split verification)",
    "ns": "one row per source (bounded key)",
    "agg": "one row per event_type (bounded key)",
    "sizes": "one row per cohort week (bounded by time span)",
    'med.select("event_type", "median")': "one row per event_type",
    "b": "distinct p_name vocabulary — saturates at 64 (measured)",
    # bounded-by-contract query/centroid sets
    "q": "query set, MAX_BROADCAST_QUERY_ROWS contract",
    "off_df": "cumsum offsets — ≤ partitions+groups rows (contiguous runs), "
    "group cardinality driver-map-bounded by contract",
    "seed": "N_CELLS seed vectors",
    "cellcfg": "one row per IVF cell (N_CELLS-bounded cell→nsub config)",
    "stats": "one row per embedding dim (64, schema-fixed) — per-dim min/max",
    "cents": "N_CELLS trained centroids",
    "cells": "count-min sketch cell table - w*d = 256 rows (constants)",
    'dim.where(F.col("category") == "engagement")': "5-row literal event-type dim",
    "cent_df": "N_CELLS centroid frame (Lloyd-iteration input, bounded)",
    # local-collection dims (SAS label parses / driver literals)
    "dim": "local-collection dim (SAS labels / literal frame)",
    "dim.distinct()": "local-collection dim keyset",
    'dim.select(F.col(dim_key).alias(fact_key)).distinct()': "ETL dim keyset (SAS label dims, bounded)",
    'countries.alias("sc")': "SAS label dim",
    'ports.alias("sp")': "SAS label dim",
    'states.alias("sus")': "SAS label dim",
    'visa_categories.alias("svc")': "SAS label dim",
    'travel_modes.alias("stm")': "SAS label dim",
    "cd": "city-demographics dim (bounded city list)",
    "cuts": "one row per source (exact per-source quantile cutoffs)",
    "epochs": "2-row literal epoch frame",
    "kth": "one-row exact k-th-count aggregate (top-k boundary)",
    "cand_rel": "retrieval candidates — |queries| × top-k rows (query set "
    "MAX_BROADCAST_QUERY_ROWS-gated upstream, k fixed)",
    # counted-at-runtime bounds
    "keys": "merge key set — COUNTED ≤ MAX_BROADCAST_MERGE_KEYS (2M) "
    "before broadcasting; larger batches fall back to a merge-hinted "
    "shuffled join (sources/merge.py)",
}

def _balanced_arg(text: str, start: int) -> str:
    """The argument of the call opening at ``start`` (index of '('),
    matching parentheses."""
    depth, i = 0, start
    while i < len(text):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return text[start + 1 : i]
        i += 1
    raise AssertionError("unbalanced parens")


def _broadcast_args():
    hits = []
    marker = "F.broadcast"
    # "sources" and "streaming" joined the scan in r13 (r12 advice: the
    # merge key-set broadcast silently escaped this inventory)
    for sub in ("workload", "plans", "operators", "sources", "streaming"):
        for path in sorted((PKG / sub).glob("*.py")):
            text = path.read_text()
            idx = 0
            while (idx := text.find(marker, idx)) != -1:
                open_paren = idx + len(marker)
                if open_paren < len(text) and text[open_paren] == "(":
                    arg = " ".join(_balanced_arg(text, open_paren).split())
                    hits.append((f"{sub}/{path.name}", arg))
                idx = open_paren
    return hits


def test_every_forced_broadcast_is_bounded():
    unexplained = [
        (loc, arg) for loc, arg in _broadcast_args() if arg not in ALLOWED
    ]
    assert not unexplained, (
        "forced broadcast of an expression not on the bounded allowlist "
        f"(add it WITH a boundedness argument): {unexplained}"
    )


def test_no_scaling_table_is_broadcast():
    """Belt-and-braces: none of the SF-scaling base-table variable names
    may appear as a broadcast argument, allowlisted or not."""
    scaling = {"customer", "cust", "supplier", "supp", "part", "orders",
               "li", "lineitem", "docs", "emb", "c"}
    offenders = [
        (loc, arg) for loc, arg in _broadcast_args() if arg in scaling
    ]
    assert not offenders, f"SF-scaling table broadcast: {offenders}"
