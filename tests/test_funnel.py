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


def test_event_transitions_probs_sum_to_one(spark):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import funnel

    df = spark.createDataFrame(
        [(1, 1, "a", 1000), (2, 1, "b", 2000), (3, 1, "a", 3000),
         (4, 2, "a", 1000), (5, 2, "c", 2000)],
        "event_id long, user_id long, event_type string, ts long",
    ).withColumn("ts", F.timestamp_millis("ts"))
    out = funnel.event_transitions(df).collect()
    # user1: a->b, b->a; user2: a->c
    m = {(r["from_type"], r["to_type"]): (r["n"], r["prob"]) for r in out}
    assert m[("a", "b")] == (1, 0.5) and m[("a", "c")] == (1, 0.5)
    assert m[("b", "a")] == (1, 1.0)
    by_from = {}
    for (f_, _), (_, p) in m.items():
        by_from[f_] = by_from.get(f_, 0.0) + p
    assert all(abs(v - 1.0) < 1e-9 for v in by_from.values())


def test_frequent_pairs_counts_and_lift(spark):
    from kafka_connect_morphlines_spark.functions import funnel

    rows = [
        (1, "milk"), (1, "bread"), (1, "eggs"),
        (2, "milk"), (2, "bread"),
        (3, "milk"), (3, "beer"),
        (4, "bread"), (4, "eggs"),
    ]
    df = spark.createDataFrame(rows, "basket long, item string")
    got = {
        (r["item_a"], r["item_b"]): (r["support"], r["lift"])
        for r in funnel.frequent_pairs(df, "basket", "item", min_support=2).collect()
    }
    # milk+bread in baskets 1,2; bread+eggs in 1,4
    assert got[("bread", "milk")][0] == 2 and got[("bread", "eggs")][0] == 2
    assert ("beer", "milk") not in got  # support 1 < 2
    # lift(bread, milk) = (2/4) / ((3/4)*(3/4)) = 8/9
    assert abs(got[("bread", "milk")][1] - round(8 / 9, 6)) < 1e-9


def test_ab_test_z_sign_and_magnitude(spark):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import funnel

    # arm a converts 60/100, arm b converts 40/100 -> z > 2
    df = spark.range(200).select(
        F.when(F.col("id") < 100, "a").otherwise("b").alias("arm"),
        ((F.col("id") < 60) | ((F.col("id") >= 100) & (F.col("id") < 140))).alias("ok"),
    )
    row = funnel.ab_test_zscores(df, "arm", F.col("ok")).collect()[0]
    assert (row["na"], row["ca"], row["nb"], row["cb"]) == (100, 60, 100, 40)
    assert (row["rate_a_ppm"], row["rate_b_ppm"]) == (600000, 400000)
    # z = 0.2 / sqrt(0.5*0.5*(2/100)) ~= 2.8284 -> 28284 at x10k
    assert row["z"] > 2.5


def test_touch_attribution_first_last(spark):
    from kafka_connect_morphlines_spark.functions import funnel

    rows = [
        # user 1: view(t1) -> click(t2) -> purchase(t3, $10)
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, None),
        (2, "2024-01-01 11:00:00", 1, "click", 0.0, None),
        (3, "2024-01-01 12:00:00", 1, "purchase", 10.0, None),
        # user 2: click 8 days before purchase -> outside lookback, dropped
        (4, "2024-01-01 00:00:00", 2, "click", 0.0, None),
        (5, "2024-01-09 00:00:01", 2, "purchase", 5.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.channel: r for r in funnel.touch_attribution(df, "purchase", 7).collect()}
    # only user 1's purchase attributes: first=view, last=click
    assert set(out) == {"view", "click"}
    assert out["view"].n_first == 1 and out["view"].first_touch_rev == 10.0
    assert out["view"].n_last == 0 and out["view"].last_touch_rev == 0.0
    assert out["click"].n_last == 1 and out["click"].last_touch_rev == 10.0


def test_touch_attribution_boundary_exclusive(spark):
    from kafka_connect_morphlines_spark.functions import funnel

    rows = [
        # touch exactly AT the purchase timestamp is NOT a prior touch
        (1, "2024-01-01 12:00:00", 1, "view", 0.0, None),
        (2, "2024-01-01 12:00:00", 1, "purchase", 3.0, None),
        # touch exactly lookback days earlier IS included (>= boundary)
        (3, "2024-01-03 12:00:00", 2, "click", 0.0, None),
        (4, "2024-01-10 12:00:00", 2, "purchase", 4.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.channel: r for r in funnel.touch_attribution(df, "purchase", 7).collect()}
    assert set(out) == {"click"}
    assert out["click"].n_first == 1 and out["click"].first_touch_rev == 4.0


def test_km_retention_censoring(spark):
    from kafka_connect_morphlines_spark.functions import funnel

    rows = []
    eid = 0
    # observation end = 2024-02-01 (user 99's last event).
    # users 1..4: lifetime 0,1,1,2 days, all ending well before end -> churned.
    for uid, days in [(1, 0), (2, 1), (3, 1), (4, 2)]:
        eid += 1
        rows.append((eid, "2024-01-01 00:00:00", uid, "view", 0.0, None))
        eid += 1
        rows.append((eid, f"2024-01-0{1 + days} 00:00:00", uid, "click", 0.0, None))
    # user 99 active at the end -> censored (never a death)
    rows.append((98, "2024-01-01 00:00:00", 99, "view", 0.0, None))
    rows.append((99, "2024-02-01 00:00:00", 99, "view", 0.0, None))
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.t_days: r for r in funnel.km_retention(df, horizon_days=7).collect()}
    # deaths at t=0 (1), t=1 (2), t=2 (1); user 99 (t=31, censored) is at
    # risk throughout but never a death row.
    assert set(out) == {0, 1, 2}
    assert out[0].n_risk == 5 and out[0].d_churned == 1
    assert out[1].n_risk == 4 and out[1].d_churned == 2
    assert out[2].n_risk == 2 and out[2].d_churned == 1
    # S(0)=4/5, S(1)=4/5*2/4, S(2)=0.4*1/2
    assert out[0].survival == 0.8
    assert out[1].survival == 0.4
    assert out[2].survival == 0.2


def test_decayed_engagement_weights(spark):
    from kafka_connect_morphlines_spark.functions import funnel
    import math

    rows = [
        (1, "2024-01-01 00:00:00", 1, "view", 100.0, None),  # 30 days old
        (2, "2024-01-31 00:00:00", 1, "view", 100.0, None),  # at the end
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = funnel.decayed_engagement(df, tau_days=30.0).collect()[0]
    expect = round(round(100.0 * math.exp(-1.0), 9) + 100.0, 4)
    assert out.n_events == 2 and out.decayed_value == expect
