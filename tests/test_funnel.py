"""Funnel / cohort-retention operator tests on hand-checkable event frames."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import funnel


def ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1 completes the whole funnel, in order
        (1, ts("2024-01-01 10:00:00"), "signup"),
        (1, ts("2024-01-02 10:00:00"), "click"),
        (1, ts("2024-01-03 10:00:00"), "buy"),
        # user 2: clicked BEFORE signup, never after -> funnel stops at signup
        (2, ts("2024-01-01 09:00:00"), "click"),
        (2, ts("2024-01-01 12:00:00"), "signup"),
        # user 3: signup + click, no buy; the pre-signup click is ignored,
        # the later one counts
        (3, ts("2024-01-05 08:00:00"), "click"),
        (3, ts("2024-01-05 09:00:00"), "signup"),
        (3, ts("2024-01-06 09:00:00"), "click"),
        # user 4 never signs up -> not in the funnel at all
        (4, ts("2024-01-02 10:00:00"), "click"),
        (4, ts("2024-01-02 11:00:00"), "buy"),
        # user 5: simultaneous signup+click (inclusive ordering counts it)
        (5, ts("2024-01-08 10:00:00"), "signup"),
        (5, ts("2024-01-08 10:00:00"), "click"),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_steps(events):
    out = {r["user_id"]: r for r in funnel.funnel_steps(events, ["signup", "click", "buy"]).collect()}
    assert set(out) == {1, 2, 3, 5}
    assert out[1]["t_buy"] == ts("2024-01-03 10:00:00")
    assert out[2]["t_click"] is None and out[2]["t_buy"] is None
    assert out[3]["t_click"] == ts("2024-01-06 09:00:00")  # pre-signup click ignored
    assert out[3]["t_buy"] is None
    assert out[5]["t_click"] == ts("2024-01-08 10:00:00")  # same-instant counts


def test_funnel_counts(events):
    steps = ["signup", "click", "buy"]
    row = funnel.funnel_counts(funnel.funnel_steps(events, steps), steps).collect()[0]
    assert (row["n_signup"], row["n_click"], row["n_buy"]) == (4, 3, 1)


def test_cohort_retention(events):
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_active"]
        for r in funnel.cohort_retention(events, "signup").collect()
    }
    # users 1,2 cohort Mon 2024-01-01; user 3 cohort 2024-01-01 (signup Jan 5
    # -> same ISO week); user 5 cohort 2024-01-08
    assert got[("2024-01-01", 0)] == 3
    assert got.get(("2024-01-08", 0)) == 1
    # no negative offsets, user 4 absent everywhere
    assert all(off >= 0 for (_, off) in got)
