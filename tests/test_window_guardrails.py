"""Corpus-wide single-partition-window guardrail.

The scale discipline says no certified query may rank/window DATA-SIZED
input on one partition (the classic ``row_number().over(Window.orderBy)``
trap — at 100 TB that partition is the job).  The r09/r10 order-stat
reworks (orderstats._rank2 / global_rank_pick / with_global_index /
covering-bucket quantiles) exist precisely to replace that shape, so this
test asserts the invariant over EVERY registered query's pre-AQE physical
plan: no Window (or WindowGroupLimit) operator fed by an
``Exchange SinglePartition``.

Windows over driver-built literal frames (bounded offset/quota tables,
m-row source lists) execute during query BUILD and never appear in the
final plan, so they do not trip this — which is exactly the boundary we
want: bounded-by-contract frames may sort on one partition, corpus-sized
frames may not.
"""

from __future__ import annotations

import pytest

from kafka_connect_morphlines_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Queries allowed to single-partition-window DATA-sized frames: none.
ALLOWED: set[str] = set()


def _single_partition_windows(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        seg = line.split("+-")[-1].split(":-")[-1].strip()
        if seg.startswith("Window ") or seg.startswith("WindowGroupLimit"):
            ctx = "\n".join(lines[i : i + 4])
            if "SinglePartition" in ctx:
                bad.append(seg[:100])
    return bad


def test_no_query_windows_on_a_single_partition(spark):
    """One pass over every query's plan, two corpus-wide invariants:
    no single-partition Window, and no CartesianProduct anywhere (the
    named-query NO_CARTESIAN list in test_plan_guardrails checks the
    AQE-finalized executed plans of the riskiest joins; this is the
    cheap pre-AQE net over the whole corpus)."""
    failures = {}
    for name, spec in QUERIES.items():
        if name in ALLOWED:
            continue
        try:
            df = spec.build(spark, SF_DIR)
            plan = df._jdf.queryExecution().sparkPlan().toString()
        except Exception as ex:  # build errors are other tests' job
            pytest.fail(f"{name}: build failed during plan audit: {ex!r}")
        bad = _single_partition_windows(plan)
        if "CartesianProduct" in plan:
            bad = bad + ["CartesianProduct"]
        if bad:
            failures[name] = bad
    assert not failures, (
        "100TB-hostile plan shapes found: "
        + "; ".join(f"{n}: {b}" for n, b in failures.items())
    )
