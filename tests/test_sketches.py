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


# ---------------------------------------------------------------------------
# DDSketch
# ---------------------------------------------------------------------------


def test_dd_quantiles_within_alpha(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    rng = np.random.RandomState(7)
    vals = np.exp(rng.normal(3.0, 1.5, size=5000))  # lognormal, wide range
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    sk = sketches.dd_sketch(df, F.col("value"), alpha=0.01)
    row = sketches.dd_quantiles(sk, [0.5, 0.95, 0.99], alpha=0.01).collect()[0]
    svals = np.sort(vals)
    for q, col in [(0.5, "p50"), (0.95, "p95"), (0.99, "p99")]:
        exact = svals[max(int(np.ceil(q * len(svals))) - 1, 0)]
        rel = abs(row[col] - exact) / exact
        assert rel <= 0.011, (col, row[col], exact, rel)


def test_dd_merge_exact(spark):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    df = spark.range(2000).select(
        (F.col("id") % 3).alias("shard"), (F.col("id") * 0.37 + 0.01).alias("value")
    )
    whole = sketches.dd_sketch(df, F.col("value"))
    parts = [
        sketches.dd_sketch(df.filter(F.col("shard") == s), F.col("value"))
        for s in range(3)
    ]
    merged = sketches.dd_merge(*parts)
    a = {(r["bucket"]): r["cnt"] for r in whole.collect()}
    b = {(r["bucket"]): r["cnt"] for r in merged.collect()}
    assert a == b and sum(a.values()) == 2000


def test_hll_overlap_tracks_exact(spark):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    a = spark.range(0, 8000).select(F.col("id").alias("u"))       # 0..7999
    b = spark.range(6000, 14000).select(F.col("id").alias("u"))   # 6000..13999 -> overlap 2000
    row = sketches.hll_overlap(a, b, "u").collect()[0]
    assert abs(row["est_a"] - 8000) / 8000 < 0.05
    assert abs(row["est_b"] - 8000) / 8000 < 0.05
    # subtraction amplifies HLL error; allow a wider envelope on the overlap
    assert abs(row["est_intersection"] - 2000) / 2000 < 0.25


def test_hll_rolling_distinct_tracks_exact(spark):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = {
        r["bucket"]: r["rolling_distinct"]
        for r in sketches.hll_rolling_distinct(ev, "user_id", window_buckets=6).collect()
    }
    # exact sliding distinct via a range self-join (fine at test scale)
    b = ev.select(F.date_trunc("hour", "ts").alias("b"), "user_id").distinct()
    exact = {
        r["b"]: r["n"]
        for r in b.alias("x")
        .join(
            b.select(F.col("b").alias("b2"), F.col("user_id").alias("u2")).alias("y"),
            (F.col("b2") <= F.col("b"))
            & (F.col("b2") >= F.col("b") - F.expr("INTERVAL 5 hours")),
        )
        .groupBy("b")
        .agg(F.countDistinct("u2").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert abs(got[k] - exact[k]) / max(exact[k], 1) < 0.05, (k, got[k], exact[k])


def test_dd_sketch_ignores_nulls(spark):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (None,), (None,)], "value double"
    )
    sk = sketches.dd_sketch(df, F.col("value"))
    assert sum(r["cnt"] for r in sk.collect()) == 2


def test_portable_hll_error_envelope_and_pure_python_parity(spark):
    """Portable HLL (md5 registers): estimate within the 256-register error
    envelope AND bit-identical to a pure-Python reference of the same
    construction (the no-Spark cross-check the DuckDB oracle also does)."""
    import hashlib
    import math

    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    n = 5000
    df = spark.createDataFrame([(f"user-{i % 1200}",) for i in range(n)], "k string")
    est = sketches.hll_estimate(sketches.hll_build(df, F.col("k"))).collect()[0]["estimate"]
    assert abs(est - 1200) / 1200 < 0.15  # ~6.5% typical at m=256

    regs = {}
    for i in range(1200):
        h = hashlib.md5(f"user-{i}".encode()).hexdigest()
        reg = int(h[:2], 16)
        tail = h[2:15]
        stripped = tail.lstrip("0")
        z = len(tail) - len(stripped)
        if z == 13:
            rho = 53
        else:
            c = stripped[0]
            clz = {"1": 3, "2": 2, "3": 2, "4": 1, "5": 1, "6": 1, "7": 1}.get(c, 0)
            rho = 4 * z + clz + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    s = sum(1 << (53 - r) for r in regs.values()) + (256 - len(regs)) * (1 << 53)
    e_raw = sketches._HLL_ALPHA_NUM / float(s)
    v = 256 - len(regs)
    want = 256.0 * math.log(256.0 / v) if (e_raw <= 640.0 and v > 0) else e_raw
    assert est == want


def test_portable_hll_merge_is_register_max(spark):
    """hll_build(A ∪ B) == hll_merge(hll_build(A), hll_build(B)) exactly."""
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import sketches

    a = spark.createDataFrame([(f"x{i}",) for i in range(300)], "k string")
    b = spark.createDataFrame([(f"x{i}",) for i in range(150, 450)], "k string")
    merged = {
        (r["reg"], r["rho"])
        for r in sketches.hll_merge(
            sketches.hll_build(a, F.col("k")), sketches.hll_build(b, F.col("k"))
        ).collect()
    }
    direct = {
        (r["reg"], r["rho"])
        for r in sketches.hll_build(a.unionByName(b), F.col("k")).collect()
    }
    assert merged == direct
