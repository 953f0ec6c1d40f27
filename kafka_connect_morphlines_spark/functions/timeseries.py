"""Time-series regularization: resampling to a fixed grid + gap filling.

The shape monitoring/feature pipelines need over event streams: per key,
snap observations to a regular grid (last observation per bucket), generate
the missing buckets, and forward-fill values across gaps.

Scale design (100 TB):
- bucketing + last-per-bucket is one map-side-combined groupBy (max_by is
  an ordinary aggregate);
- the grid generates from each key's (min, max) bucket with
  ``sequence``+``explode`` — grid size is bounded by span/step per key,
  never by the observation count;
- forward fill is ``last(ignorenulls)`` over a per-key ordered window — one
  shuffle by key total for grid+fill (the join and window share the
  partitioning).
Skew note: a key whose span/step is huge explodes a long grid row — cap
``step`` appropriately or pre-split the span; observations themselves never
inflate.

The reference repo has no temporal operators beyond convertTimestamp
(SURVEY.md §2 Part B.2); this family is part of the beyond-reference
Part C surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_UNIT_TO_INTERVAL = {
    "minute": "INTERVAL 1 MINUTE",
    "hour": "INTERVAL 1 HOUR",
    "day": "INTERVAL 1 DAY",
    "week": "INTERVAL 1 WEEK",
}


def resample_ffill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Per-key regular grid at ``unit`` granularity with forward-filled
    values.

    Output: (key, bucket, value, n_obs) — ``value`` is the last observation
    at-or-before the bucket (within the key's own [min, max] span),
    ``n_obs`` the observation count inside the bucket (0 = gap row).
    The last-in-bucket pick is max_by over the raw timestamp; the window
    fill is ``last(ignorenulls)`` over bucket order.
    """
    if unit not in _UNIT_TO_INTERVAL:
        raise ValueError(f"unsupported unit {unit!r}; one of {sorted(_UNIT_TO_INTERVAL)}")
    step = F.expr(_UNIT_TO_INTERVAL[unit])
    key, ts, val = F.col(key_col), F.col(ts_col), F.col(value_col)
    b = df.select(key.alias("_k"), F.date_trunc(unit, ts).alias("bucket"), ts.alias("_ts"), val.alias("_v"))
    per_bucket = b.groupBy("_k", "bucket").agg(
        F.max_by("_v", "_ts").alias("_obs"), F.count(F.lit(1)).alias("n_obs")
    )
    span = b.groupBy("_k").agg(F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi"))
    grid = span.select("_k", F.explode(F.sequence(F.col("_lo"), F.col("_hi"), step)).alias("bucket"))
    j = grid.join(per_bucket, ["_k", "bucket"], "left")
    w = Window.partitionBy("_k").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        F.col("_k").alias(key_col),
        F.col("bucket"),
        F.last("_obs", ignorenulls=True).over(w).alias(value_col),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
    )


def rolling_stats(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window_rows: int = 24,
) -> DataFrame:
    """Trailing moving average / min / max over the previous ``window_rows``
    observations per key (row-frame window — one shuffle by key)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    # decimal accumulation: double summation is order-dependent, so a
    # repartition could flip a rounded digit (see queries.money_sum); the
    # exact decimal sum also backs the oracle-certified roll_sum leg
    dec_sum = F.sum(F.col(value_col).cast("decimal(23,6)")).over(w)
    return df.select(
        "*",
        dec_sum.alias("roll_sum_dec"),
        (dec_sum.cast("double") / F.count(F.col(value_col)).over(w)).alias("roll_avg"),
        F.min(value_col).over(w).alias("roll_min"),
        F.max(value_col).over(w).alias("roll_max"),
    )


def zscore_anomalies(
    df: DataFrame,
    value_col: str = "value",
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "hour",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Per-key z-score anomaly flags over bucketed series — metric-monitor
    style outlier detection (which hours deviate >z sigma from the key's
    own distribution).

    Determinism contract: stddev over doubles is summation-order dependent
    (not associative), so instead of stddev_samp the moments accumulate as
    DECIMAL sums — sum(x) and sum(x^2) are exact and associative, and
    variance = (sx2 - sx^2/n) / (n-1) is then a fixed double expression.
    Same idiom as plans/queries.money_sum; the oracle mirrors it term for
    term, making the z-scores hash-stable across engines and partitionings.

    100 TB shape: one bucketed groupBy (map-side combine) collapses event
    volume to keys x buckets rows; the per-key moment aggregation and the
    final z projection run over that bucket table only.
    """
    b = df.select(
        F.col(key_col).alias("k"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(value_col).cast("double").alias("v"),
    )
    per_bucket = b.groupBy("k", "bucket").agg(
        F.round(F.sum(F.col("v").cast("decimal(23,6)")), 4).cast("double").alias("x"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = Window.partitionBy("k")
    stats = per_bucket.select(
        "*",
        F.sum(F.col("x").cast("decimal(23,6)")).over(w).alias("_sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(30,6)")).over(w).alias("_sx2"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )
    # divide in DOUBLE, not decimal: decimal-division result scales differ
    # between engines, double division is IEEE-identical everywhere
    mean = F.col("_sx").cast("double") / F.col("_n")
    # ANSI mode makes x/0 an error: a key with one bucket has no variance
    # and can never be its own anomaly — null z, filtered out below
    var = F.when(
        F.col("_n") > 1,
        (F.col("_sx2").cast("double") - F.col("_sx").cast("double") * F.col("_sx").cast("double") / F.col("_n"))
        / (F.col("_n") - 1),
    )
    z = F.when(var > 0, (F.col("x") - mean) / F.sqrt(var))
    return (
        stats.select(
            "k",
            "bucket",
            "x",
            "n_events",
            F.round(z, 4).alias("z"),
        )
        .filter(F.abs(F.col("z")) > z_threshold)
    )


def mann_kendall_trend(series: DataFrame, t: Column, v: Column) -> DataFrame:
    """Mann-Kendall trend test + Theil-Sen slope over a (time, value)
    series — the standard nonparametric "is this KPI drifting?" monitor
    (no normality assumption, robust to outliers).

    Exactness: values arrive as exact DECIMALs, so every pairwise
    comparison (the S statistic), the tie correction and the variance
    numerator are exact integers; Z and tau_b then divide through
    correctly-rounded doubles.  Theil-Sen = the exact median of pairwise
    slopes, each one DECIMAL-diff-cast-to-double / integer-day-gap (two
    correctly-rounded ops), middle elements picked by rank.

    Scale shape (r10 rework, VERDICT r09 #4): the pair table is bounded
    by the SERIES length squared — calendar days, not input rows (a
    decade is ~13M pairs) — checkpointed ONCE as a single double column,
    and never shuffled: the slope median is found by DISTRIBUTED
    SELECTION (orderstats.global_rank_pick — bucket by driver-baked
    boundary literals, bounded per-bucket totals, sort only the crossing
    buckets), replacing the r08/r09 single-partition
    ``row_number().over(Window.orderBy(slope))`` over all C(n,2) pairs.
    The S statistic reads the same frame: day gaps are positive, so
    sgn(value diff) == sign(slope) and S = Σ sign(slope)."""
    from kafka_connect_morphlines_spark.functions import orderstats

    s = series.select(t.alias("_t"), v.alias("_v"))
    s = s.localCheckpoint()  # tiny day-level series, reused 3x
    # the broadcast NLJ's output inherits the LEFT side's partitioning —
    # the checkpointed day series is 1 tiny partition, which would put
    # all C(n,2) pair generation and every aggregate over it on one core
    par = s.sparkSession.sparkContext.defaultParallelism
    a, b = s.repartition(par).alias("a"), s.alias("b")
    pairs = a.join(b, F.col("a._t") < F.col("b._t")).select(
        (
            (F.col("b._v") - F.col("a._v")).cast("double")
            / F.datediff(F.col("b._t"), F.col("a._t"))
        ).alias("slope"),
        F.lit(1).alias("_c"),
    )
    # one 8-bytes-per-pair materialization; read by the S aggregate and
    # the three bounded global_rank_pick jobs (bounds/totals/pick)
    pairs = pairs.localCheckpoint()
    n_row = s.agg(F.count(F.lit(1)).alias("n"))
    ties = (
        s.groupBy("_v")
        .agg(F.count(F.lit(1)).alias("tc"))
        .agg(
            F.sum(F.col("tc") * (F.col("tc") - 1) * (2 * F.col("tc") + 5)).alias("tie3"),
            F.sum(F.col("tc") * (F.col("tc") - 1) / 2).cast("long").alias("tie2"),
        )
    )
    s_stat = pairs.agg(
        F.sum(
            F.when(F.col("slope") > 0, 1).when(F.col("slope") < 0, -1).otherwise(0)
        ).alias("s")
    )
    n_pairs = pairs.count()
    k1, k2 = (n_pairs + 1) // 2, (n_pairs + 2) // 2
    med = orderstats.global_rank_pick(
        pairs, "slope", "_c", [k1, k2] if n_pairs else [1]
    ).agg(F.avg("slope").alias("theil_sen_slope"))
    base = (
        n_row.crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(s_stat))
        .crossJoin(F.broadcast(med))
    )
    n = F.col("n")
    var_num = (n * (n - 1) * (2 * n + 5) - F.col("tie3")).cast("double")
    var_s = var_num / F.lit(18.0)
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    n0 = (n * (n - 1) / 2).cast("long")
    tau_b = F.try_divide(
        F.col("s").cast("double"),
        F.sqrt((n0 - F.col("tie2")).cast("double") * n0.cast("double")),
    )
    return base.select(
        n.cast("long").alias("n_points"),
        F.col("s").cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.round(z, 6).alias("z"),
        F.round(tau_b, 6).alias("tau_b"),
        F.round(F.col("theil_sen_slope"), 6).alias("theil_sen_slope"),
    )


def siegel_repeated_median_slope(series: DataFrame, t: Column, v: Column) -> DataFrame:
    """Siegel repeated-median slope — the fast, highest-breakdown (50%)
    robust-trend companion to the exact Theil-Sen in mann_kendall_trend.

    slope = median_i( median_{j != i} (v_j - v_i)/(t_j - t_i) )

    Why a second mode exists (r09, VERDICT next-round #5): exact Theil-Sen
    ranks ALL C(n,2) pairwise slopes in ONE partition to pick the global
    median — the costliest accepted plan per useful row in the engine
    (~5s at sf0.1's ~2.4k-day series).  The repeated median keeps the
    same O(n^2) pair count but computes n independent inner medians (one
    per point, over its n-1 slopes) across all cores, and the outer
    median ranks only n values.  No single-partition million-row sort
    anywhere.  Measured at a 7300-day series under identical load:
    40.5s vs the exact mode's 138s (3.4x); comparable at 2.4k days where
    pair GENERATION, not the median, dominates (docs/SCALE.md r09).

    Exactness trade (documented, not hidden): this is a DIFFERENT
    estimator than Theil-Sen — statistically (higher breakdown point,
    same O(1/sqrt(n)) efficiency class), not an approximation of the
    Theil-Sen value.  Each inner/outer median is the exact rank-picked
    median (avg of the two middle elements on even counts) with the same
    correctly-rounded double slope chain as the exact mode, so the result
    is deterministic and SQL-oracle-certifiable bit-for-bit.

    Scale shape: pair table is series-length-squared (calendar days, not
    input rows); medians are picked from sort_array(collect_list(...))
    INSIDE a hash aggregate — the per-group in-memory sort replaces
    WindowExec, which measured 62s of external-sort machinery for the
    same result.  Memory bound: each collected array is series-length-
    sized (7300 days = 58 KB, a 100-year daily series = 292 KB), never
    corpus-sized."""
    s = series.select(t.alias("_t"), v.alias("_v"))
    s = s.localCheckpoint()  # tiny day-level series, joined to itself
    # n is a DRIVER-KNOWN constant (the series is checkpointed; one count
    # over it is bounded by calendar days): every inner group has exactly
    # n-1 slopes and the outer median ranks exactly n values, so both
    # "count over window" passes collapse to literals — one window pass
    # with one sort instead of two WindowExec nodes per level.
    n = s.count()
    # the broadcast NLJ's output inherits the LEFT side's partitioning —
    # the checkpointed day series is 1 tiny partition, which would put
    # all C(n,2) pair generation, the explode and the inner-median
    # partial aggregation on one core (same fix as mann_kendall_trend)
    par = s.sparkSession.sparkContext.defaultParallelism
    a, b = s.repartition(par).alias("a"), s.alias("b")
    # half-pair table (i < j), then each unordered pair feeds BOTH
    # endpoints' inner medians via one cheap explode (slope(i,j) ==
    # slope(j,i)) — half the nested-loop output of the naive != join
    pairs = (
        a.join(b, F.col("a._t") < F.col("b._t"))
        .select(
            F.explode(
                F.array(F.col("a._t"), F.col("b._t"))
            ).alias("_i"),
            (
                (F.col("b._v") - F.col("a._v")).cast("double")
                / F.datediff(F.col("b._t"), F.col("a._t"))
            ).alias("slope"),
        )
    )
    # Median-pick via sort_array(collect_list(...)): each group's n-1
    # slopes sort IN MEMORY inside the aggregate (7300 days = 58 KB per
    # group), replacing WindowExec entirely — the row_number formulation
    # measured 62s at a 7300-day series (WindowExec's external-sort
    # machinery over 53M rows) vs ~3s for the same shuffle feeding a
    # hash aggregate.  (a[lo]+a[hi])/2 is the exact rank-picked median:
    # odd counts make lo==hi so (x+x)/2 == x exactly; even counts average
    # the two middles with the identical IEEE ops as the SQL oracle's
    # avg() over two rows.
    cnt_in = n - 1
    lo_in, hi_in = (cnt_in + 1) // 2, (cnt_in + 2) // 2
    inner = pairs.groupBy("_i").agg(
        F.sort_array(F.collect_list("slope")).alias("_arr")
    ).select(
        (
            (
                F.element_at(F.col("_arr"), lo_in)
                + F.element_at(F.col("_arr"), hi_in)
            )
            / 2
        ).alias("med_i")
    )
    lo_out, hi_out = (n + 1) // 2, (n + 2) // 2
    outer = inner.agg(
        F.sort_array(F.collect_list("med_i")).alias("_arr")
    ).select(
        F.lit(n).cast("long").alias("n_points"),
        F.round(
            (
                F.element_at(F.col("_arr"), lo_out)
                + F.element_at(F.col("_arr"), hi_out)
            )
            / 2,
            6,
        ).alias("repeated_median_slope"),
    )
    return outer


def cusum_changepoint(series: DataFrame, t: Column, v: Column) -> DataFrame:
    """CUSUM changepoint estimate over a (time, value) series: the
    classic control-chart method — the changepoint is the argmax of
    |cumulative sum of deviations from the global mean|.

    Exactness: the mean is never materialized.  Deviations are scaled
    by n (``n*x_t - total``), which keeps every cumulative sum an EXACT
    DECIMAL — the same clear-the-denominator move as the alpha/quota
    operators — so the argmax day is engine-exact; only the reported
    magnitude divides back by n (one correctly-rounded double op,
    rounded 6dp).  The ordered window is bounded by the series length
    (calendar days), never input rows.

    Output: one row (change_point, cusum_peak, direction) — direction
    +1 means the level shifts UP after the change point (the deviation
    cumsum bottoms out there), -1 down.
    """
    from pyspark.sql import Window

    s = series.select(t.alias("_t"), v.cast("decimal(23,6)").alias("_v"))
    tot = s.agg(
        F.sum("_v").alias("_tot"), F.count(F.lit(1)).alias("_n")
    )
    j = s.crossJoin(F.broadcast(tot))
    dev = j.select(
        "_t",
        "_n",
        (
            F.col("_n").cast("decimal(38,6)") * F.col("_v").cast("decimal(38,6)")
            - F.col("_tot").cast("decimal(38,6)")
        ).alias("_d"),
    )
    w = Window.orderBy("_t").rowsBetween(Window.unboundedPreceding, 0)
    cum = dev.select("_t", "_n", F.sum("_d").over(w).alias("_c"))
    top = cum.orderBy(F.abs(F.col("_c")).desc(), F.col("_t").asc()).limit(1)
    return top.select(
        F.col("_t").cast("date").alias("change_point"),
        F.round(
            F.abs(F.col("_c")).cast("double") / F.col("_n").cast("double"), 6
        ).alias("cusum_peak"),
        F.when(F.col("_c") < 0, F.lit(1)).otherwise(F.lit(-1)).alias("direction"),
    )
