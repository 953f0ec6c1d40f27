"""Regenerate BENCH_FLOORS.json: per-query committed floor = the minimum
warm (min-of-3) reading across every committed BENCH_DETAIL.json revision
at sf0.1, optionally folding in isolated own-JVM readings.

Usage:
    python tools/gen_floors.py [isolated.json ...]

Each optional argument is a JSON file whose top level (or "queries" key)
maps query name -> seconds (e.g. the summary line of
tools/isolated_bench.py, saved to a file).  Lower readings win; a floor
only ever goes DOWN — a slower round never raises the bar it is graded
against.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_DOC = (
    "Per-query committed floor seconds at sf0.1 on local[32]: the best "
    "warm (min-of-3) reading ever recorded for the query, across all "
    "committed BENCH_DETAIL.json revisions and isolated own-JVM "
    "best-of-3 runs (tools/isolated_bench.py). bench.py auto-reruns "
    "any query whose warm min exceeds 2x its floor before recording, "
    "and lowers a floor in-file is NOT done automatically - regenerate "
    "with tools/gen_floors.py after a faster verified reading."
)


def main() -> None:
    floors: dict[str, float] = {}
    # keep existing floors so a floor never rises when old BENCH_DETAIL
    # revisions fall out of scope
    path = os.path.join(REPO, "BENCH_FLOORS.json")
    if os.path.exists(path):
        floors.update(json.load(open(path)).get("floors", {}))
    revs = subprocess.run(
        ["git", "log", "--format=%H", "--", "BENCH_DETAIL.json"],
        capture_output=True,
        text=True,
        cwd=REPO,
    ).stdout.split()
    for rev in revs:
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
            if k not in floors or v < floors[k]:
                floors[k] = v
    for extra in sys.argv[1:]:
        d = json.load(open(extra))
        qmap = d.get("queries", d)
        for k, v in qmap.items():
            if isinstance(v, (int, float)) and (k not in floors or v < floors[k]):
                floors[k] = float(v)
    out = {"_doc": _DOC, "floors": {k: round(v, 3) for k, v in sorted(floors.items())}}
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(f"{len(floors)} floors, sum {round(sum(floors.values()), 1)}s -> {path}")


if __name__ == "__main__":
    main()
