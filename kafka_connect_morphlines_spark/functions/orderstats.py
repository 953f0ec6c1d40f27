"""Distributed EXACT order statistics.

Spark's built-ins offer approx_percentile (sketch, not exact) and
percentile (exact but interpolated doubles, single-partition per group);
neither gives an engine-portable exact weighted quantile.  This module
computes exact weighted quantiles with a distributed-ranking discipline
related to evalmetrics._rank2 (r09), reworked in r10 to be
DETERMINISTIC BY CONSTRUCTION: instead of range-repartitioning and
trusting spark_partition_id ordering (the r09 design, the suspect
surface behind the one CORRECTNESS_r09 hash mismatch), values are
bucketed by EXPLICIT boundary literals computed once on the driver.
Bucket ids are then a pure function of the data value — independent of
partitioning, task scheduling, AQE coalescing, and checkpoint block
lifetime — and the final answer is provably identical for ANY choice of
boundaries (they only load-balance), so no freeze/checkpoint of runtime
state is required at all.

Definition (lower weighted quantile, exact rational threshold): for
weights w_v summed per distinct value v within a group, total W, and a
rational quantile num/den, the result is the smallest v with

    den * cum(v) >= num * W        (cum = inclusive cumulative weight)

All comparisons are products of exact DECIMAL integers — no division, no
interpolation — so Spark and DuckDB agree bit-for-bit and the value
itself is an actual data value (the statistically meaningful choice for
skewed money-like columns, and the only convention that needs no float
contract at all).
"""

from __future__ import annotations

import math

from decimal import Decimal

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import NumericType

__all__ = [
    "weighted_quantiles_by_group",
    "weighted_quantile_by_group",
    "global_rank_pick",
    "with_global_index",
    "interpolated_quantiles_by_group",
    "bucketed_cumsum",
    "monotone_log_bucket",
]

# ---------------------------------------------------------------------------
# Deterministic order-preserving bucketing (r10 optimization round).
#
# Every distributed order-stat primitive here needs a bucket id that is a
# monotone function of the value, purely to LOAD-BALANCE the within-bucket
# ordered pass (offsets make the answer bucketing-invariant — pinned by the
# path-parity tests).  The original r10 design derived [p1, p99] edges from
# a percentile_approx job per call — one extra full scan of the input plus a
# driver round-trip, at EVERY scale (guide §1.2: remove passes before tuning
# anything else).  This helper replaces those edges with a DATA-INDEPENDENT
# map: `floor(log(|v|) * S/ln 2)` slices each power-of-two octave of the
# double range into S slots, with rails for sign/zero/NaN/±inf, so bucket id
# is a pure codegen function of the value — no edges job, no sample, no
# driver literal baked from data.
#
# Monotonicity: within a sign region the chain  v -> |v| -> log -> *K ->
# floor  is monotone as COMPUTED: StrictMath/Math.log is monotone (fdlibm),
# and IEEE multiply by a positive literal and floor are monotone under
# rounding.  tests/test_log_bucket.py pins this against the actual JVM on
# every octave boundary of the double range (subnormals included, with
# nextafter neighbors) plus ~60k random nextafter pairs.
#
# Balance: S slots per octave means data spanning k octaves spreads over
# ~k*S buckets (uniform-[a,2a) data fills all S slots of one octave).  The
# worst-case bucket-id range is +/- ~5*OFF (a few hundred thousand), so the
# per-bucket collects stay bounded: at most (octaves spanned) * S non-empty
# rows — ~2100*S for data spanning the whole double range, a few MB on the
# driver in the absolute worst case, dozens of rows for real metric data.
# ---------------------------------------------------------------------------


def monotone_log_bucket(v: Column, slots_per_octave: int = 64) -> Column:
    """Deterministic, data-independent, order-preserving bucket id for a
    DOUBLE column: smaller value -> smaller (or equal) bucket, computed
    entirely in codegen (no edges job, no sampled literals).

    NULL input yields NULL — callers decide where NULLs sort (every call
    site wraps this in an explicit isNull branch).  NaN gets the top
    bucket (Spark sorts NaN last), ±inf get rails beyond every finite
    bucket, zero (either sign) gets bucket 0.
    """
    k = float(slots_per_octave) / math.log(2.0)
    # |log|v|| <= 744.44 (ln of the smallest denormal), so |pos| <= off-2
    off = int(745.0 * k) + 2
    a = F.abs(v)
    pos = F.floor(F.log(a) * F.lit(k)).cast("long")
    return (
        F.when(F.isnan(v), F.lit(5 * off))
        .when(v == F.lit(float("inf")), F.lit(4 * off))
        .when(v == F.lit(float("-inf")), F.lit(-4 * off))
        .when(v == F.lit(0.0), F.lit(0))
        .when(v > F.lit(0.0), F.lit(off) + pos)
        .otherwise(F.lit(-off) - pos)
    ).cast("int")


def global_rank_pick(
    counts: DataFrame,
    value_col: str,
    count_col: str,
    ks: list[int],
    num_buckets: int = 128,
    cutoff: int = 200_000,
    max_rounds: int = 20,
    stats: dict | None = None,
    with_ranks: str | None = None,
) -> DataFrame:
    """Rows of a (value, count) frame whose INCLUSIVE cumulative count by
    ascending value crosses any 1-based integer rank in ``ks`` — the
    ungrouped integer-rank sibling of weighted_quantiles_by_group, run as
    classic ITERATIVE DISTRIBUTED SELECTION (r10): each round buckets
    every surviving value RANGE with codegen ``width_bucket`` calls (one
    scan for all ranges via a bounded composite grouping key), collects
    the bounded per-bucket (count, min, max) table, locates on the driver
    which buckets hold the requested ranks, and narrows EACH pending rank
    to its own covering bucket with PURE RANGE PREDICATES (value >= lo
    AND value <= hi) — disjoint per-rank intervals, so spread ranks
    (quartiles, percent grids) converge geometrically instead of
    narrowing the single span between the lowest and highest pending
    rank.  Once an interval holds <= ``cutoff`` rows, one window sort of
    that bounded remainder applies the exact crossing conditions (one
    such sort per surviving interval, interval count <= len(ks)).

    Why ranges and not bucket-id columns: a driver-baked boundary
    when-chain is fine to FILTER on but pathological to OUTPUT (measured
    17s to project 46k rows carrying a 63-term when-chain column vs 0.4s
    for the equivalent range filter — deep nested expressions defeat
    codegen at plan boundaries).  width_bucket is a single codegen
    builtin, and no computed column ever crosses a stage boundary.

    Determinism: bucket edges are literals derived from collected
    min/max; the picked VALUES are identical for any bucketing (ranges
    only load-balance), so the result is independent of partitioning and
    scheduling by construction.  No data-sized shuffle or sort exists
    anywhere; the final sort is <= cutoff rows by construction.

    Counts must be positive.  Rows need not be distinct by value: for a
    tie run the crossing rank hits exactly one row of the run and every
    row of the run carries the same value, so the picked VALUE is
    deterministic (callers with extra non-value columns on tied rows get
    an arbitrary representative).  A value row is returned once even if
    it covers several requested ranks (callers that average middle
    elements get the right answer because (v+v)/2 = v).  Skew/plateau
    guard: a bucket whose min == max IS a single value — its covered
    ranks resolve immediately; ``max_rounds`` caps pathological
    float-edge stalls, falling back to sorting the survivors.
    ``counts`` is read once per round plus once per surviving interval
    for the final pick (interval count <= len(ks)) — checkpoint/cache it
    upstream.  Pass a dict as ``stats`` to receive
    ``{"rounds", "final_interval_rows"}`` — the convergence pin used by
    the regression tests (every surviving interval must be <= cutoff
    unless max_rounds or a plateau stopped narrowing).

    ``with_ranks``: name of an extra ``array<long>`` output column
    listing, per picked row, the requested ranks it covers (sorted) — the
    label a percent-grid consumer needs when two requested ranks land on
    the same value row (a tie plateau) and the row is emitted once.
    Costs one bounded per-k conditional array per interval; ``None``
    (default) leaves the output schema — and therefore every certified
    consumer's plan — untouched.
    """
    if not ks:
        raise ValueError("ks must be non-empty")
    vc, cc = F.col(value_col), F.col(count_col)
    first = counts.agg(
        F.min(vc).alias("_lo"),
        F.max(vc).alias("_hi"),
        F.sum(cc).alias("_n"),
        F.sum(F.when(vc.isNull(), 1).otherwise(0)).alias("_nulls"),
    ).first()
    if first["_nulls"]:
        # a NULL has no place in a total order: min/max skip it, so every
        # offset downstream would silently shift — fail loudly instead
        raise ValueError("global_rank_pick: value column contains NULLs")
    def _empty() -> DataFrame:
        out = counts.filter(F.lit(False))
        if with_ranks is not None:
            out = out.withColumn(with_ranks, F.array().cast("array<long>"))
        return out

    if first["_n"] is None:
        return _empty()
    total = int(first["_n"])
    want = sorted({int(k) for k in ks if 1 <= int(k) <= total})
    if not want:
        return _empty()
    numeric = True
    try:
        float(first["_lo"])
    except (TypeError, ValueError):
        numeric = False  # orderable non-numeric: skip narrowing rounds
    # Disjoint surviving intervals, each owning the pending ranks whose
    # crossing rows lie inside it.  Narrowing is PER INTERVAL (r10 fix):
    # the old single-interval loop narrowed to the span between the
    # LOWEST and HIGHEST pending rank, so spread ranks (e.g. quartiles)
    # barely narrowed per round and the fallback sorted millions of rows
    # in one partition.  Per-rank covering buckets shrink geometrically
    # (1/num_buckets per round) regardless of rank spread, and intervals
    # are disjoint by construction (width_bucket is monotone in value and
    # equal values share a bucket), so per-interval offsets stay exact.
    intervals: list[dict] = [
        {"lo": first["_lo"], "hi": first["_hi"], "off": 0, "n": total, "ks": want}
    ]
    resolved: list = []  # (rank, value) pinned by single-value buckets
    stride = num_buckets + 2
    rounds = 0
    while numeric and rounds < max_rounds:
        active = [
            iv
            for iv in intervals
            if iv["n"] > cutoff
            and iv["lo"] != iv["hi"]
            and float(iv["hi"]) > float(iv["lo"])  # denormal width: unsplittable
        ]
        if not active:
            break
        rounds += 1
        # ONE scan buckets every active interval: composite key = interval
        # index * stride + width_bucket within that interval's edges.  The
        # when-chain is bounded by the number of pending rank clusters
        # (<= len(ks)), evaluated once per row inside the scan stage as a
        # grouping key — never a data-sized output column crossing a plan
        # boundary.  Rows outside every active interval key to NULL and
        # are dropped by the partial aggregate.
        key = None
        for i, iv in enumerate(active):
            flo, fhi = float(iv["lo"]), float(iv["hi"])
            # width_bucket: 1..B inside [lo, hi); hi itself maps to B+1 -> clamp
            b = F.least(
                F.width_bucket(vc.cast("double"), F.lit(flo), F.lit(fhi), F.lit(num_buckets)),
                F.lit(num_buckets),
            )
            cond = (vc >= F.lit(iv["lo"])) & (vc <= F.lit(iv["hi"]))
            expr = F.lit(i * stride) + b
            key = F.when(cond, expr) if key is None else key.when(cond, expr)
        rows = (
            counts.groupBy(key.alias("_ib"))
            .agg(F.sum(cc).alias("_t"), F.min(vc).alias("_mn"), F.max(vc).alias("_mx"))
            .filter(F.col("_ib").isNotNull())
            .collect()
        )
        by_iv: dict[int, list] = {}
        for r in rows:
            ib = int(r["_ib"])
            by_iv.setdefault(ib // stride, []).append(
                (ib % stride, int(r["_t"]), r["_mn"], r["_mx"])
            )
        active_ids = {id(iv) for iv in active}
        new_intervals = [iv for iv in intervals if id(iv) not in active_ids]
        for i, iv in enumerate(active):
            run = iv["off"]
            for _b, t, mn, mx in sorted(by_iv.get(i, [])):
                covered = [k for k in iv["ks"] if run < k <= run + t]
                if covered:
                    if mn == mx:
                        resolved.extend([(k, mn) for k in covered])
                    else:
                        new_intervals.append(
                            {"lo": mn, "hi": mx, "off": run, "n": t, "ks": covered}
                        )
                run += t
        intervals = new_intervals
    if stats is not None:
        stats["rounds"] = rounds
        stats["final_interval_rows"] = [iv["n"] for iv in intervals if iv["ks"]]
    picked = None
    live = [iv for iv in intervals if iv["ks"]]
    if live:
        # ONE window job finishes every surviving interval: rows of all
        # intervals are tagged with a bounded interval-id when-chain and
        # the window sorts PER INTERVAL (partitionBy the id), so each
        # partition is <= cutoff rows by construction (or the
        # max_rounds/plateau fallback survivors) and the counts frame is
        # scanned once instead of once per interval.  A lone whole-frame
        # interval (non-numeric values, or inputs below the cutoff)
        # skips the literal range filter — collected non-numeric min/max
        # never round-trip through F.lit — at the documented cost of one
        # single-partition sort of the (small) frame.
        if len(live) == 1 and live[0]["off"] == 0 and live[0]["n"] == total:
            src = counts.withColumn("_iv", F.lit(0))
        else:
            conds = [
                (vc >= F.lit(iv["lo"])) & (vc <= F.lit(iv["hi"])) for iv in live
            ]
            keep = conds[0]
            for c in conds[1:]:
                keep = keep | c
            ivid = None
            for i, c in enumerate(conds):
                ivid = F.when(c, i) if ivid is None else ivid.when(c, i)
            src = counts.filter(keep).withColumn("_iv", ivid)
        off_expr = F.lit(int(live[0]["off"])).cast("long")
        if len(live) > 1:
            off_expr = None
            for i, iv in enumerate(live):
                clause = (F.col("_iv") == i, F.lit(int(iv["off"])).cast("long"))
                off_expr = (
                    F.when(*clause) if off_expr is None else off_expr.when(*clause)
                )
        w_local = Window.partitionBy("_iv").orderBy(value_col).rowsBetween(
            Window.unboundedPreceding, -1
        )
        local = src.withColumn(
            "_before",
            off_expr + F.coalesce(F.sum(count_col).over(w_local), F.lit(0)).cast("long"),
        ).withColumn("_cum", F.col("_before") + cc.cast("long"))

        def _cross(k: int) -> Column:
            kl = F.lit(int(k)).cast("long")
            return (F.col("_cum") >= kl) & (F.col("_before") < kl)

        cond = F.lit(False)
        for i, iv in enumerate(live):
            for k in iv["ks"]:
                cond = cond | ((F.col("_iv") == i) & _cross(k))
        part = local.filter(cond)
        if with_ranks is not None:
            all_ks = sorted({int(k) for iv in live for k in iv["ks"]})
            part = part.withColumn(
                with_ranks,
                F.array_compact(
                    F.array(
                        *[
                            F.when(_cross(k), F.lit(int(k)).cast("long"))
                            for k in all_ks
                        ]
                    )
                ),
            )
        picked = part.drop("_iv", "_before", "_cum")
    if resolved:
        # single-value buckets resolved on the driver: emit literal rows
        # (one per distinct value) shaped like the input frame
        spark = counts.sparkSession
        distinct_vals = sorted({v for _, v in resolved})
        val_schema = counts.select(value_col).schema
        if with_ranks is None:
            lit_rows = spark.createDataFrame([(v,) for v in distinct_vals], val_schema)
            extra = []
        else:
            from pyspark.sql.types import ArrayType, LongType, StructField, StructType

            lit_rows = spark.createDataFrame(
                [
                    (v, sorted(int(k) for k, vv in resolved if vv == v))
                    for v in distinct_vals
                ],
                StructType(
                    list(val_schema.fields)
                    + [StructField(with_ranks, ArrayType(LongType()), False)]
                ),
            )
            extra = [F.col(with_ranks)]
        filled = lit_rows.select(
            *[
                F.col(value_col) if c == value_col else F.lit(None).cast(f.dataType).alias(c)
                for c, f in zip(counts.columns, counts.schema.fields)
            ],
            *extra,
        )
        picked = filled if picked is None else picked.unionByName(filled)
    return picked if picked is not None else _empty()


def weighted_quantiles_by_group(
    df: DataFrame,
    group: Column,
    value: Column,
    weight: Column,
    quantiles: dict[str, tuple[int, int]],
    num_buckets: int = 64,
) -> DataFrame:
    """Exact lower weighted quantiles of ``value`` weighted by ``weight``
    within each ``group`` — ALL requested quantiles from ONE pass.

    ``quantiles`` maps output column name -> (num, den), e.g.
    ``{"median": (1, 2), "p90": (9, 10)}``.  Returns one row per group:
    (grp, w_total, <name>...).  Group keys are stringified (the bounded
    driver offset tables round-trip through literal frames); weights must
    be positive (enforced on the raw rows — a nonpositive weight would
    make the cumulative non-monotonic and the crossing filter match 0 or
    2+ rows, silently dropping the group).

    Scale shape (late-r10 covering-bucket discipline — NO materialization;
    the first r10 cut checkpointed the full distinct (group, value) frame
    and windowed all of it, and the 20M-row smoke showed that checkpoint
    dominating under storage-memory pressure):
    1. bucket id = one codegen ``monotone_log_bucket`` expression — a
       DATA-INDEPENDENT order-preserving map (r10 optimization round:
       the earlier percentile_approx-over-1%-sample edges job cost one
       extra full scan + driver round-trip per call; edges affect ONLY
       load balance — the cumulative weights, and hence the crossing
       rows, are identical for any bucketing).  Still not a
       per-boundary literal when-chain: a deep nested expression is
       fine to filter on but pathological to carry through window/join
       codegen — measured 17s to project a 63-term chain column vs
       0.4s for a single codegen builtin;
    3. ONE corpus pass computes per-(group, bucket) weight totals
       straight off the RAW rows (map-side combined, no distinct) and
       folds the weight-positivity guard into the same aggregate —
       bounded collect: at most #groups * num_buckets rows;
    4. offsets, W totals, and each quantile's COVERING bucket — the one
       bucket whose cumulative crosses num*W/den, <= |quantiles| per
       group — are found on the DRIVER with exact Decimal comparisons;
    5. only the covering buckets are filtered from the raw rows
       (broadcast join on the bounded bucket table), collapsed to
       distinct values with exact DECIMAL weight sums, windowed
       PARTITIONED BY (group, bucket) — no data-sized single partition,
       no dependence on physical partition ids — and each crossing row
       is picked by two exact DECIMAL-product comparisons
       (den*cum >= num*W > den*cum_before) in ONE conditional
       aggregation.
    ``df`` is scanned twice (totals, covering slice) — cache it
    upstream if scans are expensive.
    """
    if not quantiles:
        raise ValueError("quantiles must be a non-empty {name: (num, den)} dict")
    for name, (q_num, q_den) in quantiles.items():
        if q_den <= 0 or q_num <= 0 or q_num > q_den:
            raise ValueError(f"quantile {name!r}: need 0 < num <= den, got {q_num}/{q_den}")
    dec = "decimal(38,6)"
    # (18,6) keeps the per-row weight long-backed through the corpus-
    # sized aggregates (a wider cast materializes a JVM BigDecimal per
    # row); Spark widens SUM types automatically, so totals stay exact
    raw = df.select(
        group.cast("string").alias("_g"),
        value.alias("_v"),
        weight.cast("decimal(18,6)").alias("_w"),
    )
    # r10 optimization round: bucket ids come from the data-independent
    # monotone_log_bucket (order-preserving pure codegen) instead of
    # percentile_approx edges over a 1% sample — one fewer full scan and
    # one fewer driver round-trip per call at every scale; the answer is
    # bucketing-invariant (path-parity pinned), edges only load-balanced.
    # NULL _v -> a rail below every finite bucket (NULLS FIRST).  The
    # window below orders _v in its NATIVE type, so the cast("double")
    # bucketing is only order-consistent for numeric value types; a
    # non-numeric (but orderable) type falls back to one bucket per
    # group — the same single-window degradation the old
    # percentile_approx-raises path had.
    if num_buckets < 3 or not isinstance(raw.schema["_v"].dataType, NumericType):
        bkt = F.when(F.col("_v").isNull(), F.lit(-1)).otherwise(F.lit(0))
    else:
        bkt = F.when(F.col("_v").isNull(), F.lit(-(1 << 30))).otherwise(
            F.coalesce(
                monotone_log_bucket(F.col("_v").cast("double"), num_buckets),
                F.lit(1 << 30),
            )
        )
    bucketed = raw.withColumn("_b", bkt.cast("int"))
    # ONE corpus pass: per-(group, bucket) weight totals + the positivity
    # guard, as a bounded collect (<= #groups * num_buckets rows)
    totals = (
        bucketed.groupBy("_g", "_b")
        .agg(
            F.sum("_w").alias("_t"),
            F.sum(F.when(F.col("_w") <= 0, 1).otherwise(0)).alias("_bad"),
        )
        .collect()
    )
    if any(r["_bad"] for r in totals):
        raise ValueError(
            "weighted_quantiles_by_group: nonpositive weight — weights "
            "must be positive for the crossing pick to be unique"
        )
    # per-group prefix offsets by ascending bucket id (bucket order IS
    # value order within each group by construction)
    by_group: dict = {}
    for r in sorted(totals, key=lambda r: (str(r["_g"]), r["_b"])):
        key = r["_g"]
        acc, rows = by_group.setdefault(key, [Decimal(0), {}])
        rows[r["_b"]] = acc
        by_group[key][0] = acc + Decimal(str(r["_t"]))
    w_total = {k: v[0] for k, v in by_group.items()}
    # covering bucket per (group, quantile): the first bucket whose
    # cumulative weight reaches num*W/den — exact Decimal comparisons,
    # <= num_buckets steps per quantile on bounded driver state
    cov_rows = []
    for g, (tot, offs) in by_group.items():
        bs = sorted(offs)
        ends = [offs[b] for b in bs[1:]] + [tot]
        covered = set()
        for q_num, q_den in quantiles.values():
            target = q_num * tot
            for i, end in enumerate(ends):
                if q_den * end >= target:
                    covered.add(i)
                    break
        cov_rows.extend((g, bs[i], str(offs[bs[i]])) for i in sorted(covered))
    tot_rows = [(k, str(v)) for k, v in w_total.items()]
    spark = df.sparkSession
    cov_df = spark.createDataFrame(
        cov_rows or [("", -2, "0")], "_g string, _b int, _off string"
    ).select("_g", "_b", F.col("_off").cast(dec).alias("_off"))
    tot_df = spark.createDataFrame(
        tot_rows or [("", "0")], "_g string, _wt string"
    ).select("_g", F.col("_wt").cast(dec).alias("_wt"))
    w_local = Window.partitionBy("_g", "_b").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    joined = (
        bucketed.join(F.broadcast(cov_df), ["_g", "_b"])
        .groupBy("_g", "_b", "_off", "_v")
        .agg(F.sum("_w").alias("_wv"))
        .withColumn(
            "_before_local",
            F.coalesce(F.sum("_wv").over(w_local), F.lit(0).cast(dec)),
        )
        .join(F.broadcast(tot_df), "_g")
    )
    cum_before = F.col("_off") + F.col("_before_local")
    cum = cum_before + F.col("_wv")
    # ALL quantiles from ONE pass over the windowed frame: each crossing
    # condition matches exactly one row per group (weights positive), so
    # a conditional max picks it — no per-quantile plan branch re-running
    # the window, no k-way join of crossing frames
    conds = {}
    for name, (q_num, q_den) in quantiles.items():
        # (4,0) x (38,6) stays within Spark's 38-precision cap (no silent
        # rounding of the product — the comparison must stay exact); a
        # (38,6) x (38,6) multiply would be precision-capped and rounded
        num = F.lit(q_num).cast("decimal(4,0)")
        den = F.lit(q_den).cast("decimal(4,0)")
        conds[name] = (den * cum >= num * F.col("_wt")) & (
            den * cum_before < num * F.col("_wt")
        )
    any_cond = None
    for c in conds.values():
        any_cond = c if any_cond is None else (any_cond | c)
    out = (
        joined.filter(any_cond)
        .groupBy("_g")
        .agg(
            F.max("_wt").alias("w_total"),
            *[
                F.max(F.when(c, F.col("_v"))).alias(name)
                for name, c in conds.items()
            ],
        )
        .select(F.col("_g").alias("grp"), "w_total", *conds.keys())
    )
    return out.orderBy("grp")


def weighted_quantile_by_group(
    df: DataFrame,
    group: Column,
    value: Column,
    weight: Column,
    q_num: int = 1,
    q_den: int = 2,
) -> DataFrame:
    """Single-quantile convenience wrapper (default: weighted median).
    Returns (grp, w_total, quantile_value); see
    weighted_quantiles_by_group for semantics and scale shape."""
    return weighted_quantiles_by_group(
        df, group, value, weight, {"quantile_value": (q_num, q_den)}
    )


def with_global_index(
    df: DataFrame,
    value_col: str,
    tiebreaks: list[str] | None = None,
    index_col: str = "_i",
    num_buckets: int = 256,
):
    """Attach an exact GLOBAL 1-based dense row index ordered by
    ``(value_col, *tiebreaks)`` — distributedly: one codegen
    ``monotone_log_bucket`` expression buckets the rows (a pure
    DATA-INDEPENDENT order-preserving function of the value — no edges
    job at all since the r10 optimization round), per-bucket counts are
    collected (bounded by the octave span) and prefix-summed on the
    driver, and the
    within-bucket ``row_number`` runs partitioned by bucket — no
    data-sized single-partition sort anywhere.  The classic replacement
    for ``row_number().over(Window.orderBy(...))`` when EVERY row needs
    its rank (Gini / Lorenz / trapezoid-AUC shapes), not just a quantile
    crossing (use global_rank_pick for that).

    Ties on ``value_col`` never straddle buckets (equal values bucket
    equally), so compound ordering is exact within one bucket window.
    Returns ``(df_with_index, n_total)`` — ``n_total`` is the exact row
    count (a free by-product of the offsets collect).  ``df`` is read
    twice (totals + the indexed pass): checkpoint/cache it upstream.
    ``value_col`` must be non-null numeric; NULL tiebreaks follow Spark's
    NULLS FIRST.
    """
    vc = F.col(value_col)
    # r10 optimization round: data-independent monotone_log_bucket
    # replaces the percentile_approx edges job (which here scanned the
    # FULL frame, not even a sample) — one fewer scan + driver
    # round-trip; ranks are bucketing-invariant (offsets absorb any
    # monotone bucketing).  NaN takes the helper's top rail (NaN sorts
    # last); value_col is non-null numeric by contract, but a
    # non-numeric orderable type still degrades safely to one bucket
    # (the window orders value_col natively, so a cast-based bucket
    # would not be order-consistent for it).
    if num_buckets < 3 or not isinstance(df.schema[value_col].dataType, NumericType):
        bkt = F.lit(0)
    else:
        bkt = F.coalesce(
            monotone_log_bucket(vc.cast("double"), num_buckets), F.lit(1 << 30)
        )
    bucketed = df.withColumn("_gb", bkt.cast("int"))
    totals = bucketed.groupBy("_gb").agg(F.count(F.lit(1)).alias("_t")).collect()
    off: dict[int, int] = {}
    acc = 0
    for r in sorted(totals, key=lambda r: r["_gb"]):
        off[r["_gb"]] = acc
        acc += int(r["_t"])
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        list(off.items()) or [(0, 0)], "_gb int, _goff long"
    )
    w = Window.partitionBy("_gb").orderBy(value_col, *(tiebreaks or []))
    out = (
        bucketed.join(F.broadcast(off_df), "_gb", "left")
        .withColumn(
            index_col,
            F.coalesce(F.col("_goff"), F.lit(0)) + F.row_number().over(w).cast("long"),
        )
        .drop("_gb", "_goff")
    )
    return out, acc


def interpolated_quantiles_by_group(
    df: DataFrame,
    group: Column,
    value: Column,
    probs: dict[str, float],
    num_buckets: int = 64,
) -> DataFrame:
    """Exact linear-interpolation quantiles per group with BIT-PARITY to
    Spark's ``percentile()`` aggregate — but constant memory per task.

    ``percentile()`` buffers a per-group value->count map inside one
    aggregation buffer (OpenHashMap in Percentile.scala), so a group with
    unbounded value cardinality concentrates on one task and OOMs at
    corpus scale.  This runs the r10 deterministic-bucket discipline
    with NO materialization at all (late-r10 rework — the first cut
    checkpointed the full distinct (group, value) frame, and the 40M-row
    smoke showed that checkpoint dominating and going superlinear under
    storage-memory pressure): bucket ids come from the data-independent
    ``monotone_log_bucket`` codegen map (r10 optimization round — the
    earlier sampled percentile_approx edges job cost one extra scan +
    driver round-trip; buckets only load-balance, results are
    bucketing-invariant by construction), per-(group, bucket)
    totals aggregate the RAW rows (map-side combined, no distinct),
    offsets and target ranks are computed on the driver, and only the
    COVERING buckets — the <= 2 * len(probs) buckets per group that can
    contain a requested rank — are filtered (broadcast semi-style join on
    the bounded offsets table), deduplicated, windowed, and fed to ONE
    conditional aggregation that picks the two neighbor values per
    quantile.  ``df`` is scanned twice (totals, covering slice) — cache
    it upstream if scans are expensive; no task ever holds more than its
    partition slice of one bucket.

    Interpolation mirrors Percentile.getPercentile exactly: for p over n
    values, ``pos = p * (n - 1)`` (double), ``lower = floor(pos)``,
    ``higher = ceil(pos)``, result = value at lower when they coincide,
    else ``(higher - pos) * v_lo + (pos - lower) * v_hi`` — the weights
    are computed on the driver with the same IEEE ops the JVM uses, and
    the final expression repeats the two-mult-one-add shape, so replacing
    a ``percentile()`` call leaves certified hashes unchanged.

    ``probs`` maps output column name -> p in [0, 1].  Values are cast to
    double (like ``percentile()``'s result); NULL values are ignored
    (same as the built-in).  Returns (grp, n, <name>...), one row per
    non-empty group.
    """
    import bisect
    import math

    if not probs:
        raise ValueError("probs must be a non-empty {name: p} dict")
    for name, p in probs.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"prob {name!r}: need 0 <= p <= 1, got {p}")
    raw = df.select(
        group.cast("string").alias("_g"), value.cast("double").alias("_v")
    ).filter(F.col("_v").isNotNull())
    # Buckets load-balance only — any monotone bucketing yields the same
    # answer — so the r10 optimization round swapped the sampled
    # percentile_approx edges job for the data-independent
    # monotone_log_bucket: one fewer scan + driver round-trip per call.
    # NULLs are filtered above; NaN takes the helper's top rail (the
    # same NaN-last ordering percentile() uses).
    if num_buckets < 3:
        bkt = F.lit(0)
    else:
        bkt = F.coalesce(
            monotone_log_bucket(F.col("_v"), num_buckets), F.lit(1 << 30)
        )
    bucketed = raw.withColumn("_b", bkt.cast("int"))
    totals = bucketed.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_t")).collect()
    by_group: dict = {}
    for r in sorted(totals, key=lambda r: (str(r["_g"]), r["_b"])):
        acc, offs = by_group.setdefault(r["_g"], [0, {}])
        offs[r["_b"]] = acc
        by_group[r["_g"]][0] = acc + int(r["_t"])
    spark = df.sparkSession
    names = list(probs)
    ks_rows = []
    cov_rows = []
    for g, (n_g, offs) in by_group.items():
        row = [g, n_g]
        need = set()
        for name in names:
            pos = probs[name] * (n_g - 1)  # same IEEE ops as the JVM
            lo = math.floor(pos)
            hi = math.ceil(pos)
            row += [lo + 1, hi + 1, float(hi) - pos, pos - float(lo)]
            need.add(lo + 1)
            need.add(hi + 1)
        ks_rows.append(tuple(row))
        # bucket b covers ranks offs[b]+1 .. offs[b]+t[b]; pick, per
        # needed rank, the last bucket whose offset is below it
        bs = sorted(offs)
        offs_list = [offs[b] for b in bs]
        covered = set()
        for k in need:
            covered.add(bisect.bisect_right(offs_list, k - 1) - 1)
        cov_rows.extend((g, bs[i], offs_list[i]) for i in sorted(covered))
    ks_schema = "_g string, _n long, " + ", ".join(
        f"_klo_{i} long, _khi_{i} long, _wl_{i} double, _wh_{i} double"
        for i in range(len(names))
    )
    ks_df = spark.createDataFrame(ks_rows or [tuple([""] + [0] + [0, 0, 0.0, 0.0] * len(names))], ks_schema)
    cov_df = spark.createDataFrame(
        cov_rows or [("", -2, 0)], "_g string, _b int, _off long"
    )
    w_local = Window.partitionBy("_g", "_b").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = (
        bucketed.join(F.broadcast(cov_df), ["_g", "_b"])
        .groupBy("_g", "_b", "_off", "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn(
            "_before",
            F.col("_off") + F.coalesce(F.sum("_c").over(w_local), F.lit(0)).cast("long"),
        )
        .withColumn("_cum", F.col("_before") + F.col("_c").cast("long"))
        .join(F.broadcast(ks_df), "_g")
    )
    any_cond = None
    sel_aggs = [F.max("_n").alias("n")]
    for i, name in enumerate(names):
        for side in ("klo", "khi"):
            k = F.col(f"_{side}_{i}")
            c = (F.col("_cum") >= k) & (F.col("_before") < k)
            any_cond = c if any_cond is None else (any_cond | c)
            sel_aggs.append(
                F.max(F.when(c, F.col("_v"))).alias(f"_v{side[1:]}_{i}")
            )
        sel_aggs += [
            F.max(f"_klo_{i}").alias(f"_klo_{i}"),
            F.max(f"_khi_{i}").alias(f"_khi_{i}"),
            F.max(f"_wl_{i}").alias(f"_wl_{i}"),
            F.max(f"_wh_{i}").alias(f"_wh_{i}"),
        ]
    picked = local.filter(any_cond).groupBy("_g").agg(*sel_aggs)
    out_cols = [F.col("_g").alias("grp"), F.col("n")]
    for i, name in enumerate(names):
        out_cols.append(
            F.when(F.col(f"_klo_{i}") == F.col(f"_khi_{i}"), F.col(f"_vlo_{i}"))
            .otherwise(
                F.col(f"_wl_{i}") * F.col(f"_vlo_{i}")
                + F.col(f"_wh_{i}") * F.col(f"_vhi_{i}")
            )
            .alias(name)
        )
    return picked.select(*out_cols).orderBy("grp")


# below this many distinct rows the ordered frame trivially fits one
# partition and the bucketed machinery (bounds + totals jobs) is pure
# overhead — the evalmetrics._RANK2_SMALL_ROWS contract
SMALL_ROWS = 5_000_000


def bucketed_cumsum(
    cnt: DataFrame,
    order_col: str,
    sums: dict[str, str],
    n_rows: int | None = None,
    num_buckets: int = 256,
    tiebreaks: list[str] | None = None,
) -> DataFrame:
    """EXCLUSIVE running totals of integer columns over the global
    ascending ``order_col`` ordering (NULLS FIRST), appended as new
    columns — the shared primitive behind every "cumulative count over a
    distinct-value frame" shape (rank-AUC, Mann-Whitney ranks, KS ECDFs,
    Zipf ranks).  ``sums`` maps output column name -> existing
    integer-typed column; each output is the exact sum of that column
    over all STRICTLY PRECEDING rows (0 for the first row).

    Adaptive scale shape (the evalmetrics._rank2 discipline): when
    ``n_rows`` (any upper bound on cnt's row count) is at or below
    SMALL_ROWS, one plain ordered window runs — the frame fits a single
    partition and that is the cheapest correct plan.  Above it, the r10
    deterministic-bucket path: one codegen ``monotone_log_bucket``
    expression over ``order_col`` (bucket id = pure DATA-INDEPENDENT
    function of the value — no edges job at all since the r10
    optimization round; independent of partitioning, scheduling, and
    checkpoint block lifetime; buckets only load-balance),
    per-bucket totals of every requested column collected (bounded by
    the octave span), prefix offsets per column computed on the driver,
    and the within-bucket exclusive window runs PARTITIONED BY bucket —
    all cores busy, no data-sized single-partition sort.  Both paths
    emit identical exact integers (CI-pinned), so certified consumers
    hash the same either way.

    ``tiebreaks`` orders rows WITHIN equal ``order_col`` values (needed
    when callers require a total order, e.g. row numbering); bucketing
    only ever splits on ``order_col`` so ties never straddle buckets.
    ``cnt`` should be checkpointed/cached by the caller when counting it
    for ``n_rows`` (the count is then ~free and the frame is not
    recomputed per downstream job).
    """
    tb = [F.col(c) for c in (tiebreaks or [])]
    order = [F.col(order_col).asc_nulls_first(), *tb]
    if n_rows is not None and n_rows <= SMALL_ROWS:
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        out = cnt
        for name, c in sums.items():
            out = out.withColumn(
                name, F.coalesce(F.sum(c).over(w), F.lit(0)).cast("long")
            )
        return out
    # r10 optimization round: the data-independent monotone_log_bucket
    # replaces the percentile_approx edges job (which scanned the FULL
    # cnt frame) — one fewer scan + driver round-trip per call; the
    # running totals are bucketing-invariant (offsets absorb any
    # monotone bucketing; both paths CI-pinned identical).  The window
    # below orders by order_col in its NATIVE type, so bucketing via
    # cast("double") is only order-consistent for numeric inputs — a
    # non-numeric orderable type falls back to one bucket (the same
    # degradation the old percentile_approx-raises path had).
    numeric = isinstance(cnt.schema[order_col].dataType, NumericType)
    if num_buckets < 3 or not numeric:
        bkt = F.when(F.col(order_col).isNull(), F.lit(-1)).otherwise(F.lit(0))
    else:
        # NULL -> a rail below every finite bucket (sorts first, matching
        # NULLS FIRST) via an EXPLICIT isNull branch; NaN takes the
        # helper's top rail (NaN sorts LAST in Spark).
        bkt = F.when(F.col(order_col).isNull(), F.lit(-(1 << 30))).otherwise(
            F.coalesce(
                monotone_log_bucket(
                    F.col(order_col).cast("double"), num_buckets
                ),
                F.lit(1 << 30),
            )
        )
    bucketed = cnt.withColumn("_cs_b", bkt.cast("int"))
    names = list(sums)
    totals = (
        bucketed.groupBy("_cs_b")
        .agg(*[F.sum(sums[n]).cast("long").alias(f"_t{i}") for i, n in enumerate(names)])
        .collect()
    )
    accs = [0] * len(names)
    off_rows = []
    for r in sorted(totals, key=lambda r: r["_cs_b"]):  # bucket order IS value order
        off_rows.append((int(r["_cs_b"]), *accs))
        accs = [a + int(r[f"_t{i}"] or 0) for i, a in enumerate(accs)]
    off_schema = "_cs_b int, " + ", ".join(f"_off{i} long" for i in range(len(names)))
    off_df = cnt.sparkSession.createDataFrame(off_rows or [(0, *[0] * len(names))], off_schema)
    w = Window.partitionBy("_cs_b").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    out = bucketed.join(F.broadcast(off_df), "_cs_b")
    for i, name in enumerate(names):
        out = out.withColumn(
            name,
            (
                F.col(f"_off{i}")
                + F.coalesce(F.sum(sums[name]).over(w), F.lit(0)).cast("long")
            ).cast("long"),
        )
    return out.drop("_cs_b", *[f"_off{i}" for i in range(len(names))])
