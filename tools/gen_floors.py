"""Regenerate BENCH_FLOORS.json: per-query committed floor = the minimum
warm (min-of-3) reading across every committed BENCH_DETAIL.json revision
at sf0.1, optionally folding in isolated own-JVM readings.

Usage:
    python tools/gen_floors.py [isolated.json ...] [--reset NAME ...]

Each optional file argument is a JSON file whose top level (or "queries"
key) maps query name -> seconds (e.g. the summary line of
tools/isolated_bench.py, saved to a file).  Lower readings win; a floor
only ever goes DOWN — a slower round never raises the bar it is graded
against — EXCEPT for queries named by ``--reset`` (ADVICE r09): a query
whose implementation intentionally changed (slower-but-more-correct
rework) re-seeds its floor from the CURRENT readings only, ignoring
history, so bench.py's 2x-floor rerun check measures the query that
exists rather than one that was deliberately replaced.  A reset name
must be covered by at least one provided readings file (the fresh
isolated reading is the new seed).

Resets are PERSISTENT: the reset epoch is recorded in
BENCH_FLOORS.json under "resets", and every later regeneration skips
BENCH_DETAIL revisions committed BEFORE a query's reset when scanning
history (post-reset in-bench readings still lower the floor).  Without
this, the next plain regeneration silently resurrected the pre-rework
floor from old revisions — which is exactly what happened to
trimmed_mean_by_type in round 10 (reset to the constant-memory
implementation's ~2s, re-folded back to the deleted percentile()
implementation's 0.457s by the next fold).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DOC = (
    "Per-query committed floor seconds at sf0.1 on local[32]: the best "
    "warm (min-of-3) reading ever recorded for the query, across all "
    "committed BENCH_DETAIL.json revisions and isolated own-JVM "
    "best-of-3 runs (tools/isolated_bench.py). bench.py auto-reruns "
    "any query whose warm min exceeds 2x its floor before recording, "
    "and lowers a floor in-file is NOT done automatically - regenerate "
    "with tools/gen_floors.py after a faster verified reading; a query "
    "whose implementation intentionally changed re-seeds via --reset."
)


def main() -> None:
    args = sys.argv[1:]
    resets: set[str] = set()
    files: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--reset":
            i += 1
            if i >= len(args):
                raise SystemExit("--reset requires a query name")
            resets.add(args[i])
        else:
            files.append(args[i])
        i += 1

    floors: dict[str, float] = {}
    reset_epochs: dict[str, int] = {}
    # keep existing floors so a floor never rises when old BENCH_DETAIL
    # revisions fall out of scope — except explicitly reset queries
    path = os.path.join(REPO, "BENCH_FLOORS.json")
    if os.path.exists(path):
        prev = json.load(open(path))
        floors.update(prev.get("floors", {}))
        reset_epochs.update(prev.get("resets", {}))
    now = int(time.time())
    for name in resets:
        floors.pop(name, None)
        reset_epochs[name] = now
    rev_lines = subprocess.run(
        ["git", "log", "--format=%H %ct", "--", "BENCH_DETAIL.json"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.splitlines()
    for line in rev_lines:
        parts = line.split()
        if len(parts) != 2:
            continue
        rev, ctime = parts[0], int(parts[1])
        raw = subprocess.run(
            ["git", "show", f"{rev}:BENCH_DETAIL.json"],
            capture_output=True,
            text=True,
            cwd=REPO,
        ).stdout
        try:
            d = json.loads(raw)
        except (ValueError, TypeError):
            continue
        if d.get("sf") != 0.1:
            continue
        for k, v in d.get("queries", {}).items():
            if ctime < reset_epochs.get(k, 0):
                continue  # reading predates the intentional rework
            if k not in floors or v < floors[k]:
                floors[k] = v
    seen_in_files: set[str] = set()
    for extra in files:
        d = json.load(open(extra))
        qmap = d.get("queries", d)
        for k, v in qmap.items():
            if not isinstance(v, (int, float)):
                continue
            seen_in_files.add(k)
            if k not in floors or v < floors[k]:
                floors[k] = float(v)
    missing = resets - seen_in_files
    if missing:
        raise SystemExit(
            f"--reset queries need a fresh reading in a provided file: {sorted(missing)}"
        )
    out = {"_doc": _DOC, "floors": {k: round(v, 3) for k, v in sorted(floors.items())}}
    if reset_epochs:
        out["resets"] = dict(sorted(reset_epochs.items()))
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(
        f"{len(floors)} floors, sum {round(sum(floors.values()), 1)}s -> {path}"
        + (f" (reset: {sorted(resets)})" if resets else "")
    )


if __name__ == "__main__":
    main()
