"""Behavioral analytics operators: ordered funnels and cohort retention.

The reference engine's event records (Kafka envelope + timestamp fields,
MorphlineTransform.java:138-147) are exactly the input these consume; the
reference itself can only transform events one at a time — cross-event
sequencing is a capability the Spark engine adds.

Shape at 100 TB:
- A funnel is N tiny per-step aggregates chained by user-keyed joins: each
  step filters the event scan to one type (predicate pushed to parquet),
  groupBy(user) min(ts) with map-side combine, then an equi-join on the
  user key against the previous step's (user, ts) frame — the frames
  shrink monotonically (each step keeps a subset of users), so every join
  after the first is a candidate for AQE broadcast.  Event payloads never
  travel: only (user, ts) pairs shuffle.
- Cohort retention is one distinct-(user, bucket) aggregate plus one
  user-keyed join against the cohort frame; the result is
  (cohorts x offsets)-sized, independent of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap: str | None = None,
) -> DataFrame:
    """Ordered funnel: for each user, the earliest time they completed each
    step AFTER completing the previous one (inclusive ordering, so a step
    sharing the prior step's timestamp counts).

    ``max_gap`` (an INTERVAL string like ``"72 hours"``) adds a conversion
    deadline: each step must land within max_gap of the PREVIOUS step's
    time, the standard attribution-window semantics (a purchase a month
    after the click doesn't convert the funnel).

    Returns one row per user who completed step 1, with a nullable
    ``t_<step>`` timestamp per step — nulls from the first uncompleted step
    onward.  Completion counts/conversion rates are a trivial aggregate of
    this frame.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{steps[0]}"))
    )
    prev = f"t_{steps[0]}"
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .join(out.select(user_col, prev), user_col)
            .filter(
                (F.col(ts_col) >= F.col(prev))
                if max_gap is None
                else (
                    (F.col(ts_col) >= F.col(prev))
                    & (F.col(ts_col) <= F.col(prev) + F.expr(f"INTERVAL {max_gap}"))
                )
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{step}"))
        )
        out = out.join(nxt, user_col, "left")
        prev = f"t_{step}"
    return out


def funnel_counts(funnel: DataFrame, steps: list[str]) -> DataFrame:
    """One-row completion counts for a :func:`funnel_steps` frame."""
    return funnel.agg(
        *[F.count(F.col(f"t_{s}")).alias(f"n_{s}") for s in steps]
    )


def cohort_retention(
    events: DataFrame,
    cohort_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    ``cohort_type`` event; for each later week, how many were active (any
    event).

    Returns (cohort_week: date, week_offset: int, n_active: long) with
    offset 0 = the cohort week itself; negative offsets (activity before
    signup) are excluded.  Result size is cohorts x offsets — independent
    of event volume, so the final aggregate is never the bottleneck.
    """
    cohort = (
        events.filter(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.to_date(F.date_trunc("week", F.min(ts_col))).alias("cohort_week"))
    )
    active = events.select(
        F.col(user_col), F.to_date(F.date_trunc("week", F.col(ts_col))).alias("week")
    ).distinct()
    j = active.join(cohort, user_col)
    offset = (F.datediff("week", "cohort_week") / 7).cast("int")
    return (
        j.select("cohort_week", offset.alias("week_offset"), F.col(user_col))
        .filter(F.col("week_offset") >= 0)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams.

    lead() within each user's (ts, id)-ordered stream pairs every event
    with its successor; the transition probability is the pair count over
    the from-state total.  The canonical "what do users do next"
    behavioral-analytics query and the statistics behind session-path
    mining.

    100 TB shape: one shuffle keyed on the user (the lead window), then a
    groupBy on the (from, to) pair — a result bounded by |event types|^2,
    with map-side combine.  The probability normalization runs over the
    pair table only (states^2 rows), never the event volume.  Tie-break on
    a unique id makes lead() — and therefore every count — deterministic
    under any partitioning.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("from_type"),
            F.lead(type_col).over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(totals), 6).alias("prob"),
    )


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
) -> DataFrame:
    """Market-basket co-occurrence: item pairs appearing together in at
    least ``min_support`` baskets, with support counts and lift.

    The useful four-fifths of association mining without FP-tree machinery:
    distinct (basket, item) rows are grouped into one sorted per-basket
    item array, a double index-explode (i < j over array positions) emits
    each unordered pair exactly once map-side, groupBy pair with map-side
    combine, then lift from broadcast per-item basket counts.

    100 TB shape: ONE shuffle of (basket, item) ids builds the per-basket
    arrays (the r10 rework removed the basket-keyed self-join, which
    shuffled and sort-merged both sides for the identical pair multiset);
    the i<j index-explode then runs map-side with partial aggregation
    before the pair shuffle.  A basket of size s still contributes
    s*(s-1)/2 pair rows — quadratic in single-basket size, never in
    catalog or basket count — but the failure mode for a pathological
    mega-basket moved: the old self-join streamed its quadratic output
    through the sort-merge, while collect_list materializes each basket
    as ONE in-memory array in a single aggregation task, so the binding
    constraint is now per-group executor memory (an s-item array, ~s
    item ids), not shuffle volume.  Cap pathological baskets upstream
    (like the LSH mega-bucket guard) before calling; retail-shaped
    baskets (s in the tens-to-thousands) are far inside the bound.
    Item counts are catalog-sized -> broadcast.
    """
    bi = baskets.select(
        F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
    ).distinct()
    if not bi.isStreaming:
        bi = bi.localCheckpoint()  # feeds the pair explode + item counts
    n_baskets = bi.select("_b").distinct().count()
    item_counts = bi.groupBy("_i").agg(F.count(F.lit(1)).alias("_ni"))
    # pair generation WITHOUT a basket-keyed self-join (r10; the
    # triangle_count_cosupply idiom): one shuffle of (basket, item) into
    # per-basket sorted item lists, then a codegen double index-explode
    # emits each i<j combination map-side with partial aggregation before
    # the pair shuffle — the self-join form shuffled both sides and
    # sort-merged them for the identical pair multiset.  Items are
    # distinct per basket, so sorted order makes item_a < item_b exact.
    per_basket = (
        bi.groupBy("_b")
        .agg(F.sort_array(F.collect_list("_i")).alias("ps"))
        .filter(F.size("ps") >= 2)
    )
    base = per_basket.select(
        "ps", F.explode(F.sequence(F.lit(1), F.size("ps") - 1)).alias("i")
    )
    pairs = (
        base.select(
            "ps", "i", F.explode(F.sequence(F.col("i") + 1, F.size("ps"))).alias("j")
        )
        .select(
            F.element_at(F.col("ps"), F.col("i")).alias("item_a"),
            F.element_at(F.col("ps"), F.col("j")).alias("item_b"),
        )
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return (
        pairs.join(F.broadcast(item_counts.withColumnRenamed("_i", "item_a").withColumnRenamed("_ni", "_na")), "item_a")
        .join(F.broadcast(item_counts.withColumnRenamed("_i", "item_b").withColumnRenamed("_ni", "_nb")), "item_b")
        .select(
            "item_a",
            "item_b",
            "support",
            F.round(
                (F.col("support") / F.lit(n_baskets))
                / ((F.col("_na") / F.lit(n_baskets)) * (F.col("_nb") / F.lit(n_baskets))),
                6,
            ).alias("lift"),
        )
    )


def ab_test_zscores(
    events: DataFrame,
    assign_col: str,
    success_col,
    group_a: str = "a",
    group_b: str = "b",
) -> DataFrame:
    """Two-proportion z-test over experiment arms: one aggregated row with
    per-arm conversion rates and the pooled z statistic.

    Pairs with traindata.hash_split (deterministic assignment is a record
    property; analysis is one map-side-combinable aggregate).  All moments
    are exact integer counts; the emitted per-arm rates are computed in
    PURE BIGINT arithmetic — ``rate_ppm = (conv*2_000_000 + n) DIV (2*n)``
    is round-half-up of conv/n in parts-per-million with no floating point
    anywhere, so it is bit-exact on every engine.  The pooled z statistic
    (z = (pa - pb) / sqrt(p(1-p)(1/na + 1/nb))) necessarily involves a
    float sqrt, so it is emitted as a plain double ``z`` for analysis /
    pytest pinning rather than a pseudo-exact scaled integer.
    """
    agg = events.groupBy(F.col(assign_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(success_col, 1).otherwise(0)).alias("conv"),
    )
    a = agg.filter(F.col("arm") == group_a).select(
        F.col("n").alias("na"), F.col("conv").alias("ca")
    )
    b = agg.filter(F.col("arm") == group_b).select(
        F.col("n").alias("nb"), F.col("conv").alias("cb")
    )
    j = a.crossJoin(b)
    pa = F.col("ca") / F.col("na")
    pb = F.col("cb") / F.col("nb")
    pool = (F.col("ca") + F.col("cb")) / (F.col("na") + F.col("nb"))
    z = (pa - pb) / F.sqrt(pool * (1 - pool) * (1 / F.col("na") + 1 / F.col("nb")))
    return j.select(
        "na", "ca", "nb", "cb",
        F.expr("(ca * 2000000 + na) div (2 * na)").alias("rate_a_ppm"),
        F.expr("(cb * 2000000 + nb) div (2 * nb)").alias("rate_b_ppm"),
        z.alias("z"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    lookback_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """First-touch / last-touch revenue attribution: each conversion's
    value is credited to the user's earliest (first-touch) and latest
    (last-touch) non-conversion event inside the lookback window.

    Distributed shape: NO purchases-x-events self-join — one user-keyed
    window pass computes, per row, the min/max (ts, id, type) struct over
    the preceding-lookback range frame (microsecond epoch so the frame
    boundary is exact), then two channel aggregates + a full outer join on
    the |channels|-sized result.  The corpus shuffles once on user_id.
    Struct min/max gives a total (ts, id) order, so ties are
    deterministic.  Conversions with no prior touch are dropped (no
    channel to credit), matching the oracle's inner join.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    touch = F.when(
        F.col(type_col) != conversion_type,
        F.struct(us.alias("us"), F.col(id_col).alias("id"), F.col(type_col).alias("ch")),
    )
    w = (
        Window.partitionBy(user_col)
        .orderBy(us)
        .rangeBetween(-lookback_days * 86_400_000_000, -1)
    )
    conv = (
        events.withColumn("_first", F.min(touch).over(w))
        .withColumn("_last", F.max(touch).over(w))
        .filter(F.col(type_col) == conversion_type)
    )
    dec_rev = F.round(F.sum(F.col(value_col).cast("decimal(23,6)")), 2).cast("double")
    ft = (
        conv.filter(F.col("_first").isNotNull())
        .groupBy(F.col("_first.ch").alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_first"), dec_rev.alias("first_touch_rev"))
    )
    lt = (
        conv.filter(F.col("_last").isNotNull())
        .groupBy(F.col("_last.ch").alias("channel"))
        .agg(F.count(F.lit(1)).alias("n_last"), dec_rev.alias("last_touch_rev"))
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .fillna(0, ["n_first", "n_last"])
        .fillna(0.0, ["first_touch_rev", "last_touch_rev"])
        .select("channel", "n_first", "first_touch_rev", "n_last", "last_touch_rev")
    )


def km_retention(
    events: DataFrame,
    horizon_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Kaplan-Meier retention curve over user lifetimes.

    Lifetime = whole days between a user's first and last event; a user
    has *churned* (death observed) if their last event is at least
    ``horizon_days`` before the corpus' observation end (global max ts) —
    otherwise they are right-censored (still alive as far as we know),
    which plain retention curves get wrong and KM is built for:
    ``S(t) = prod_{t_i <= t} (1 - d_i / n_i)`` over death times only.

    Shape: one user-keyed aggregate (first/last ts), then everything runs
    on the lifetime-days histogram — at most ~observation-window rows, so
    the at-risk reverse-cumulative and survival windows are bounded
    single-partition passes, like zipf_slope.  Hazards are exact integer
    ratios; survival accumulates 12dp-rounded ln(1-h) terms in DECIMAL
    (associative, partition-invariant) and exponentiates once per row.
    Returns (t_days, n_risk, d_churned, hazard, survival).
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    per_user = events.groupBy(user_col).agg(
        F.min(us).alias("first_us"), F.max(us).alias("last_us")
    )
    end = events.agg(F.max(us).alias("end_us"))
    day_us = 86_400_000_000
    pu = per_user.crossJoin(F.broadcast(end)).select(
        F.floor((F.col("last_us") - F.col("first_us")) / day_us).alias("t_days"),
        (F.col("last_us") <= F.col("end_us") - horizon_days * day_us).alias("churned"),
    )
    per_t = pu.groupBy("t_days").agg(
        F.count(F.lit(1)).alias("n_at"),
        F.sum(F.when(F.col("churned"), 1).otherwise(0)).alias("d_churned"),
    )
    w_risk = Window.orderBy("t_days").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    risky = per_t.withColumn("n_risk", F.sum("n_at").over(w_risk)).filter(
        F.col("d_churned") > 0
    )
    # greatest(.., 1e-12): if the last at-risk cohort churns entirely,
    # 1 - d/n = 0 and ln(0) = -inf cannot enter the DECIMAL accumulator;
    # the clamp floors survival at ~0 (rounds to 0.0) instead of crashing.
    term = F.round(
        F.log(
            F.greatest(
                F.lit(1.0)
                - F.col("d_churned").cast("double") / F.col("n_risk").cast("double"),
                F.lit(1e-12),
            )
        ),
        12,
    )
    w_surv = Window.orderBy("t_days").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        risky.withColumn("_term", term.cast("decimal(38,12)"))
        .withColumn("_cum", F.sum("_term").over(w_surv))
        .select(
            "t_days",
            "n_risk",
            "d_churned",
            F.round(
                F.col("d_churned").cast("double") / F.col("n_risk").cast("double"), 6
            ).alias("hazard"),
            F.round(F.exp(F.col("_cum").cast("double")), 6).alias("survival"),
        )
        .orderBy("t_days")
    )


def decayed_engagement(
    events: DataFrame,
    tau_days: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Exponentially time-decayed engagement score per user:
    ``sum(value * exp(-age_days / tau))`` against the corpus' observation
    end — recent activity counts fully, stale activity fades with a
    ``tau_days`` half-life-ish constant.  The streaming-friendly recency
    weighting used for user/feature freshness at scale.

    Map-only scoring (each term from the row + one broadcast scalar) +
    one user-keyed aggregate; each term is 9dp-rounded then accumulated
    in DECIMAL so the per-user sum is partition-invariant.
    Returns (user_id, n_events, decayed_value).
    """
    us = F.unix_micros(F.col(ts_col))
    end = events.agg(F.max(us).alias("end_us"))
    day_us = 86_400_000_000
    age_days = (F.col("end_us") - us).cast("double") / F.lit(float(day_us))
    term = F.round(F.col(value_col) * F.exp(-age_days / F.lit(float(tau_days))), 9)
    return (
        events.crossJoin(F.broadcast(end))
        .groupBy(user_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(term.cast("decimal(38,12)")), 4)
            .cast("double")
            .alias("decayed_value"),
        )
    )
