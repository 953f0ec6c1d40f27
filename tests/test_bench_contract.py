"""bench.py driver-contract gate.

Round 2 shipped a bench that crashed (rc=1, no JSON) on one broken query
and zeroed the entire performance signal.  This test runs the real
bench.py as a subprocess at sf0.001 and asserts the contract the driver
relies on: rc=0, exactly one parseable JSON line on stdout with the
agreed keys, a number for every headline query, and no errors.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_valid_contract_line(tmp_path):
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    # keep the committed sf0.1 BENCH_DETAIL.json out of this smoke run's way;
    # tmp_path (not a repo-relative dir) so a fresh clone can't lack the parent
    detail_path = str(tmp_path / "_bench_detail_test.json")
    env["SPARK_GRAFT_BENCH_DETAIL"] = detail_path
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        # the contract under test is validity, not speed: 114 queries x 4
        # executions crossed 900s under host-contention bursts (r09), and
        # the corpus keeps growing — size the ceiling for the contract
        timeout=2400,
    )
    assert proc.returncode == 0, f"bench rc={proc.returncode}\n{proc.stderr[-2000:]}"
    json_lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    # full metric line first, compact tail-truncation-safe line last
    assert len(json_lines) == 2, f"expected two JSON lines, got {len(json_lines)}"
    out = json.loads(json_lines[0])
    assert out["metric"] == "headline_queries_total_sec"
    assert out["unit"] == "sec" and out["value"] > 0
    assert out["sf"] == 0.001
    from bench import HEADLINE  # noqa: PLC0415

    assert set(out["queries"]) == set(HEADLINE), "a headline query has no timing"
    assert "errors" not in out, f"headline queries errored: {out.get('errors')}"
    assert set(out["queries_cold"]) == set(HEADLINE)
    # the compact final line: same totals + the slowest-20 warm map, short
    # enough to survive a 2000-char stdout tail, and parseable on its own
    compact = json.loads(json_lines[-1])
    assert compact["metric"] == out["metric"] and compact["value"] == out["value"]
    assert set(compact["queries"]) <= set(HEADLINE)
    assert len(compact["queries"]) == min(20, len(HEADLINE))
    assert compact["n_queries"] == len(HEADLINE)
    assert compact["n_errors"] == 0
    assert len(json_lines[-1]) + 1 <= 1800, "compact line must fit the driver's tail"
    # and the full metric JSON is persisted at the redirected detail path
    with open(detail_path) as fh:
        detail = json.load(fh)
    assert detail["queries"] == out["queries"]
