"""Regression check: a BENCH_r{N}.json against BASELINE.md's
Current-records table.

The r9 verdict's "What's wrong #3": every round re-derived bench
comparability by hand from 600+ lines of append-only history. The
Current-records table fixed where the data lives; this tool closes the
loop — one command answers "did anything regress this round?" under
the repo's protocol: a query regresses only if the new reading exceeds
its recorded best by >25%. Since r11 bench.py reports min-of-2 per
headliner (SPARK_GRAFT_BENCH_REPS), so a FLAG is a real signal worth a
standalone min-of-3 (tools/time_query.py) — not the old single-reading
noise, where first-execution plan cost routinely read 1.5-3x the min.

Usage: python tools/check_regressions.py BENCH_r10.json [more.json...]
Exit 0 = nothing over threshold; 1 = at least one flag.
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

THRESHOLD = 1.25
BASELINE = Path(__file__).resolve().parent.parent / "BASELINE.md"

#: Contamination band for bench.py's fixed CPU canary (r15 verdict
#: item 3): the canary job is constant work on every core, so on a
#: quiet box it reads its `_canary` record in the Current-records
#: table within normal jitter; past this band the BOX is loaded and
#: every suite reading is inflated with it — the run is annotated as
#: contaminated and its over-threshold readings print SUSP (suspect,
#: re-run on a quiet box) instead of FLAG, which is exactly the
#: adjudication the r13/r15 external-load episodes burned a human
#: cycle on each time.
CANARY_BAND = 1.5

#: Standing IN-SUITE dispositions (r15, codifying what r11-r14 each
#: re-litigated by hand): headliners whose in-suite min-of-2 reading
#: routinely exceeds the standalone record for session-context reasons
#: that were chased once with a standalone min-of-3+ and found not to
#: reproduce. A reading inside the dispositioned band prints DISP and
#: does not fail the check; ABOVE the band it flags as usual (so a
#: real regression on these queries still surfaces).
DISPOSITIONS: dict[str, tuple[float, str]] = {
    "pricing_summary": (1.65, "JIT warm-up, r11; standalone at record"),
    "dedup_winnowing_overlap": (1.65, "suite context, r13; standalone at record"),
    "doc_lm_likelihood": (1.45, "box noise, r14; standalone min-of-4 1.13x"),
}


def current_records() -> dict[str, tuple[float, str]]:
    """query -> (record_sec, protocol) from the Current-records table."""
    text = BASELINE.read_text()
    m = re.search(r"## Current records.*?\n(\|.*?)(?:\n##|\n\Z)", text, re.S)
    if not m:
        raise SystemExit("no 'Current records' table in BASELINE.md")
    out: dict[str, tuple[float, str]] = {}
    for line in m.group(1).splitlines():
        cells = [c.strip() for c in line.strip().strip("|").split("|")]
        if len(cells) < 3 or cells[0] in ("headliner", "---"):
            continue
        try:
            out[cells[0]] = (float(cells[1]), cells[2])
        except ValueError:
            continue
    return out


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    records = current_records()
    flagged = 0
    for path in sys.argv[1:]:
        bench = json.loads(Path(path).read_text())
        # driver BENCH_r{N}.json wraps bench.py's line under "parsed";
        # a raw bench.py line has "queries" at top level
        if "parsed" in bench:
            bench = bench["parsed"]
        queries = bench.get("queries", bench)
        if not all(isinstance(v, (int, float)) for v in queries.values()):
            raise SystemExit(f"{path}: could not locate the queries timing map")
        print(f"== {path} vs Current records (threshold {THRESHOLD}x)")
        contaminated = False
        canary = bench.get("canary_sec")
        if canary is not None and "_canary" in records:
            crec = records["_canary"][0]
            cratio = canary / crec
            if cratio > CANARY_BAND:
                contaminated = True
                print(
                    f"  !! LOAD-CONTAMINATED RUN: canary {canary:.2f}s vs "
                    f"record {crec:.2f}s ({cratio:.2f}x > {CANARY_BAND}x band), "
                    f"load_avg={bench.get('load_avg')}"
                )
                print(
                    "  !! constant-work canary inflated => box load, not plan "
                    "regressions; over-threshold readings below print SUSP and "
                    "do not fail the check — re-run on a quiet box to confirm"
                )
            else:
                print(f"  canary {canary:.2f}s (record {crec:.2f}s, {cratio:.2f}x — clean box)")
        for name, sec in queries.items():
            rec = records.get(name)
            if rec is None:
                print(f"  NEW   {name:35s} {sec:7.2f}  (no record yet — add one)")
                continue
            ratio = sec / rec[0]
            tag = "FLAG" if ratio > THRESHOLD else "ok"
            note = rec[1]
            if tag == "FLAG" and name in DISPOSITIONS:
                band, why = DISPOSITIONS[name]
                if ratio <= band:
                    tag, note = "DISP", f"dispositioned ≤{band}x: {why}"
            if tag == "FLAG" and contaminated:
                tag = "SUSP"
            if tag == "FLAG":
                flagged += 1
            print(
                f"  {tag:5s} {name:35s} {sec:7.2f}  record {rec[0]:6.2f}"
                f"  ({ratio:4.2f}x, {note})"
            )
    if flagged:
        print(
            f"\n{flagged} over threshold — min-of-3 each "
            "(tools/time_query.py) and disposition in BASELINE.md"
        )
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
