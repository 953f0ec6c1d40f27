"""Pin of orderstats.monotone_log_bucket — the shared DATA-INDEPENDENT
order-preserving bucket map the r10 optimization round swapped in for
every percentile_approx edges job (weighted quantiles, global index,
interpolated quantiles, bucketed cumsums, _rank2 rank maps).

The map's whole correctness contract is MONOTONICITY AS COMPUTED BY THE
JVM: v1 <= v2 must imply bucket(v1) <= bucket(v2) for the actual
float -> log -> multiply -> floor chain Spark executes (fdlibm log is
monotone; IEEE multiply-by-positive-literal and floor are monotone under
rounding).  These tests run the real expression on the real JVM over
octave-edge-adjacent doubles (every power-of-two boundary of the double
range, including the subnormal region, with nextafter neighbors) plus
random nextafter pairs, and pin the sign/zero/NaN/inf rails."""

import math
import random
import struct

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions.orderstats import (
    monotone_log_bucket,
)


def _nextafter(x: float, toward: float) -> float:
    return math.nextafter(x, toward)


def _octave_edge_values() -> list[float]:
    """Every power-of-two boundary of the positive double range with its
    adjacent representable neighbors and an interior point — the exact
    spots where floor(log2-scaled) can step."""
    vals = []
    for e in range(-1074, 1024):
        b = math.ldexp(1.0, e)
        if b == 0.0 or math.isinf(b):
            continue
        vals.extend(
            [
                _nextafter(b, 0.0),
                b,
                _nextafter(b, math.inf),
                b * 1.5 if not math.isinf(b * 1.5) else b,
            ]
        )
    vals.append(4.9e-324)  # smallest denormal
    vals.append(1.7976931348623157e308)  # max double
    return vals


def _bits_key(v: float) -> tuple:
    """Total-order sort key over doubles matching Spark's ordering for
    the finite/-0.0 cases exercised here (-0.0 == 0.0)."""
    return (v,)


@pytest.mark.parametrize("slots", [64, 256])
def test_monotone_on_octave_edges_and_random_pairs(spark, slots):
    pos = _octave_edge_values()
    rng = random.Random(4242)
    randoms = []
    for _ in range(20_000):
        # wide magnitude sweep: random sign/exponent/mantissa
        bits = rng.getrandbits(64)
        v = struct.unpack("<d", struct.pack("<Q", bits))[0]
        if math.isnan(v) or math.isinf(v):
            continue
        randoms.extend([v, _nextafter(v, math.inf), _nextafter(v, -math.inf)])
    finite = sorted(
        set(pos + [-v for v in pos] + [0.0, -0.0] + randoms)
    )
    df = spark.createDataFrame([(v,) for v in finite], "v double")
    got = {
        r["v"]: r["b"]
        for r in df.select(
            "v", monotone_log_bucket(F.col("v"), slots).alias("b")
        ).collect()
    }
    assert len(got) >= 20_000
    prev_v, prev_b = None, None
    for v in finite:
        b = got[v]
        assert b is not None
        if prev_v is not None:
            assert b >= prev_b, (
                f"monotonicity violated: bucket({prev_v!r})={prev_b} > "
                f"bucket({v!r})={b} (slots={slots})"
            )
        prev_v, prev_b = v, b


def test_rails_and_specials(spark):
    specials = [
        float("nan"),
        float("inf"),
        float("-inf"),
        0.0,
        -0.0,
        1.0,
        -1.0,
        4.9e-324,
        -4.9e-324,
        1.7976931348623157e308,
        -1.7976931348623157e308,
        None,
    ]
    df = spark.createDataFrame([(v,) for v in specials], "v double")
    rows = df.select(
        "v", monotone_log_bucket(F.col("v"), 64).alias("b")
    ).collect()
    by = {}
    for r in rows:
        key = (
            "nan"
            if (r["v"] is not None and math.isnan(r["v"]))
            else r["v"]
        )
        by[key] = r["b"]
    assert by[None] is None  # NULL passes through (callers branch on it)
    assert by[0.0] == 0 and by[-0.0] == 0
    top_finite = by[1.7976931348623157e308]
    bot_finite = by[-1.7976931348623157e308]
    assert by["nan"] > by[float("inf")] > top_finite
    assert by[float("-inf")] < bot_finite
    assert bot_finite < by[-1.0] < by[0.0] < by[1.0] < top_finite
    assert by[-4.9e-324] < 0 < by[4.9e-324] is not None
    assert by[4.9e-324] > by[0.0]
    # int range: every rail fits an int32 (the callers cast to int)
    for b in by.values():
        if b is not None:
            assert -(2**31) < b < 2**31


def test_balance_spreads_uniform_data(spark):
    """Uniform data within one octave must spread over ~all slots of
    that octave (the load-balance property the callers rely on)."""
    rng = random.Random(7)
    vals = [(rng.uniform(1024.0, 2048.0),) for _ in range(20_000)]
    df = spark.createDataFrame(vals, "v double")
    n_buckets = (
        df.select(monotone_log_bucket(F.col("v"), 64).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets >= 48  # 64 slots cover one octave; most must be hit
