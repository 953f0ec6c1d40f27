"""Count-min sketch tests: one-sided error, exactness without collisions,
mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import sketches


@pytest.fixture(scope="module")
def keyed(spark):
    # known frequencies: a:5, b:3, c:1
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)]
    return spark.createDataFrame(rows, "k string")


def test_estimates_exact_when_wide(keyed):
    sk = sketches.cms_sketch(keyed, F.col("k"), depth=4, width=4096)
    cand = keyed.select(F.col("k").alias("_key")).distinct()
    est = {
        r["_key"]: r["est_count"]
        for r in sketches.cms_estimate(sk, cand, F.col("_key"), depth=4, width=4096).collect()
    }
    assert est == {"a": 5, "b": 3, "c": 1}


def test_one_sided_error_when_narrow(keyed, spark):
    # width=1 forces every key into one bucket per row: estimate = total rows
    sk = sketches.cms_sketch(keyed, F.col("k"), depth=2, width=1)
    cand = keyed.select(F.col("k").alias("_key")).distinct()
    est = {
        r["_key"]: r["est_count"]
        for r in sketches.cms_estimate(sk, cand, F.col("_key"), depth=2, width=1).collect()
    }
    assert all(v == 9 for v in est.values())  # over-count only, never under


def test_mergeability(spark):
    a = spark.createDataFrame([("x",)] * 3 + [("y",)], "k string")
    b = spark.createDataFrame([("x",)] * 2 + [("z",)], "k string")
    whole = sketches.cms_sketch(a.unionByName(b), F.col("k"), depth=3, width=64)
    merged = sketches.cms_merge(
        sketches.cms_sketch(a, F.col("k"), depth=3, width=64),
        sketches.cms_sketch(b, F.col("k"), depth=3, width=64),
    )
    w = {(r["i"], r["bucket"]): r["cnt"] for r in whole.collect()}
    m = {(r["i"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert w == m


def test_heavy_hitters_order(keyed):
    got = sketches.cms_heavy_hitters(keyed, F.col("k"), k=2, depth=4, width=4096).collect()
    assert [(r["key"], r["est_count"]) for r in got] == [("a", 5), ("b", 3)]
