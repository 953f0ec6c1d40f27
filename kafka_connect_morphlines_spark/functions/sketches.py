"""Count-min sketch: a mergeable frequency sketch as a plain DataFrame.

Complements the HLL distinct-count rollup (plans/queries.hll_sketch_rollup):
HLL answers "how many distinct", count-min answers "about how often does
key X occur" in O(depth x width) space with a one-sided (over-count only)
error — the standard sketch behind streaming heavy-hitter monitoring.

The sketch is an ordinary (i, bucket, cnt) DataFrame, which buys three
things for free at 100 TB:
- build is explode(depth) + groupBy with map-side combine — the shuffled
  state is bounded by depth x width per map partition, never by key
  cardinality;
- merging partial sketches (per day / per shard) is union + groupBy sum —
  the mergeability that makes it a *rollup* structure;
- estimation joins a (depth x width)-row table, i.e. always broadcastable.

Buckets are md5-derived (same idiom as traindata.hash_bucket) so estimates
are deterministic and reproducible outside Spark — the DuckDB oracle builds
the identical sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


MAX_DEPTH = 5  # 32 md5 hex chars / 6 per row — one digest serves all rows


def _buckets(key: Column, depth: int, width: int) -> Column:
    """All ``depth`` bucket indices from ONE md5 of the key.

    Row i reads hex digits [1+6i, 6+6i) of the digest — disjoint 24-bit
    slices of one 128-bit hash (the Kirsch-Mitzenmacher double-hashing
    argument: independent-enough rows without d hash invocations).  md5 is
    the per-row cost at corpus scale, so computing it once instead of
    ``depth`` times is a ~d-fold build speedup.  6 hex digits < 2^24 keeps
    ``conv`` inside long range under ANSI mode; mirrored in SQL as
    CAST('0x'||substr(md5(key), 1+6*i, 6) AS BIGINT) % width.
    """
    if depth > MAX_DEPTH:
        raise ValueError(f"depth {depth} > {MAX_DEPTH}: one md5 digest holds only 5 6-hex slices")
    h = F.md5(key.cast("string"))
    return F.array(
        *[
            (F.conv(F.substring(h, 1 + 6 * i, 6), 16, 10).cast("long") % width)
            for i in range(depth)
        ]
    )


def cms_sketch(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 1024,
    weight: Column | None = None,
) -> DataFrame:
    """Build a count-min sketch (i, bucket, cnt) over one pass of ``df``.

    ``weight`` (default 1 per row) supports pre-aggregated inputs.  The
    result has at most depth x width rows regardless of input size.  The
    md5 digest is computed once per input row; posexplode then fans out the
    depth pre-computed bucket indices (cheap codegen substrings).
    """
    w = weight if weight is not None else F.lit(1)
    ex = df.select(_buckets(key, depth, width).alias("_bs"), w.alias("_w")).select(
        F.posexplode("_bs").alias("i", "bucket"), "_w"
    )
    return ex.groupBy("i", "bucket").agg(F.sum("_w").cast("long").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partial sketches built with identical (depth, width): union +
    sum — sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "est_count",
) -> DataFrame:
    """Per-key frequency estimate: min over the sketch's depth rows.

    Over-counts only (hash collisions add, never subtract); keys the sketch
    never saw estimate as the collision noise floor (0 when their buckets
    are clean).  The sketch side is depth x width rows — broadcast."""
    ex = keys.select("*", _buckets(key, depth, width).alias("_bs")).select(
        "*", F.posexplode("_bs").alias("i", "bucket")
    ).drop("_bs")
    joined = ex.join(F.broadcast(sketch), ["i", "bucket"], "left")
    group_cols = [c for c in keys.columns]
    return joined.groupBy(*group_cols).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias(out_col)
    )


def cms_heavy_hitters(
    df: DataFrame,
    key: Column,
    k: int = 10,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Top-k keys by count-min estimate, deterministic (est desc, key asc).

    Batch plan: pre-aggregate exact per-key counts first (one map-side
    combinable groupBy — the same shuffle the candidate distinct would
    cost), then build the sketch from the weighted key table.  The sketch
    content is IDENTICAL to the row-at-a-time build (bucket sums commute),
    but md5 runs once per distinct key instead of once per input row —
    40M events over 2k keys hash 2k strings, not 40M.  (Streaming callers
    keep the per-row :func:`cms_sketch`; its state, unlike this groupBy, is
    bounded by depth x width rather than key cardinality.)"""
    counts = df.groupBy(key.alias("_key")).agg(F.count(F.lit(1)).alias("_n"))
    sk = cms_sketch(counts, F.col("_key"), depth, width, weight=F.col("_n"))
    cand = counts.select("_key")
    est = cms_estimate(sk, cand, F.col("_key"), depth, width)
    return (
        est.select(F.col("_key").alias("key"), "est_count")
        .orderBy(F.col("est_count").desc(), F.col("key"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# DDSketch: mergeable quantile sketch with relative-error guarantee.
# Completes the sketch family: HLL (how many distinct), count-min (how
# often), DDSketch (how big — p50/p95/p99 at any rollup level).
# --------------------------------------------------------------------------
#
# A DDSketch [Masson, Rim, Lee — VLDB 2019] is a log-spaced histogram:
# value v > 0 lands in bucket ceil(log_gamma(v)) with gamma = (1+a)/(1-a),
# which pins every estimate within relative error a of the true quantile.
# As with the count-min above, the sketch is a plain (key..., bucket, cnt)
# DataFrame, so at 100 TB:
# - the build is one map-side-combinable groupBy whose shuffled state is
#   bounded by keys x occupied-buckets (~ keys x log_gamma(max/min), a few
#   hundred per key at a=0.01), never by row count;
# - per-day / per-shard partials merge by union + sum (exactly — bucket
#   counts commute), the property that makes quantile *rollups* possible
#   without re-scanning raw data (impossible with exact percentiles);
# - quantile extraction walks a cumulative sum over <=buckets rows per key.
#
# gamma and log(gamma) are computed ONCE in Python and inlined as literals
# on both the Spark and the oracle side, so the only per-engine libm call
# is ln(v) / exp(b*log_gamma) — last-ulp differences cannot move a bucket
# unless a value sits within one ulp of a bucket boundary.

import math


def dd_gamma(alpha: float = 0.01) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket(value: Column, alpha: float = 0.01) -> Column:
    """Log-gamma bucket index for strictly positive values.

    Zero/negative values are clamped to the smallest representable bucket
    via a floor at 1e-9 (documents the DDSketch positive-domain contract
    without crashing on dirty data)."""
    log_gamma = math.log(dd_gamma(alpha))
    v = F.greatest(value.cast("double"), F.lit(1e-9))
    return F.ceil(F.log(v) / F.lit(log_gamma)).cast("long")


def dd_sketch(
    df: DataFrame,
    value: Column,
    keys: list[Column] | None = None,
    alpha: float = 0.01,
) -> DataFrame:
    """Build per-key DDSketches: (key..., bucket, cnt) in one pass."""
    ks = keys or []
    return (
        df.filter(value.isNotNull())  # Spark greatest() skips nulls, which
        # would otherwise silently count NULL as the epsilon bucket
        .select(*ks, dd_bucket(value, alpha).alias("bucket"))
        .groupBy(*[c for c in df.select(*ks).columns], "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_merge(*sketches: DataFrame) -> DataFrame:
    """union + sum: dd_sketch(A ∪ B) == dd_merge(dd_sketch(A), dd_sketch(B))
    exactly, for identical alpha."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    group = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*group).agg(F.sum("cnt").alias("cnt"))


def dd_quantiles(
    sketch: DataFrame,
    qs: list[float],
    alpha: float = 0.01,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a sketch: one row per key, one column per q.

    The q-quantile is the smallest bucket whose cumulative count reaches
    ceil(q * n); its estimate is the bucket midpoint 2*gamma^b/(gamma+1)
    (within relative error alpha of the true order statistic).  The walk is
    a window over the per-key bucket rows — input is sketch-sized, not
    data-sized (so the no-partition-column WindowExec warning on a merged
    global sketch is benign: "all data" is <= occupied-buckets rows)."""
    from pyspark.sql import Window

    gamma = dd_gamma(alpha)
    log_gamma = math.log(gamma)
    kc = key_cols or []
    w = Window.partitionBy(*kc).orderBy("bucket")
    cum = sketch.select(
        *kc,
        "bucket",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*kc)).alias("total"),
    )
    aggs = []
    for q in qs:
        b = F.min(
            F.when(
                F.col("cum") >= F.greatest(F.ceil(F.lit(q) * F.col("total")), F.lit(1)),
                F.col("bucket"),
            )
        )
        est = F.round(
            F.lit(2.0) * F.exp(b.cast("double") * F.lit(log_gamma)) / F.lit(gamma + 1.0), 4
        )
        aggs.append(est.alias(f"p{int(round(q * 100)):02d}"))
    return cum.groupBy(*kc).agg(*aggs)


# --------------------------------------------------------------------------
# Portable HLL: an engine-reproducible HyperLogLog as a plain DataFrame.
#
# Spark's F.hll_sketch_agg (Apache DataSketches) is excellent but its binary
# sketch format and hash (murmur3-128) are engine-specific, so estimates
# cannot be re-derived outside Spark.  This variant is the classic Flajolet
# HLL built from an md5-derived hash (the same idiom as the count-min
# buckets above), with every floating step reduced to ONE inlined literal
# and ONE int64->double division — so a DuckDB oracle rebuilds the sketch
# AND the estimate bit-for-bit:
# - register index = first 2 md5 hex chars (p=8, m=256 registers);
# - rho = leading-zero count of the next 13 hex chars (52 bits) + 1,
#   computed by STRING ops (regexp '^0*' + a per-hex-char CASE), never libm;
# - harmonic sum as the INTEGER sum(2^(53-M_j)) (max 2^61, no overflow, no
#   float accumulation order dependence);
# - estimate = ALPHA_NUM / S with ALPHA_NUM precomputed in Python, plus the
#   standard linear-counting small-range correction m*ln(m/V).
#
# The sketch itself is a (keys..., reg, rho) DataFrame: build is one
# map-side-combinable groupBy-max; merge is groupBy-max again (union of
# sketches == elementwise register max, exactly); estimate reads <=m rows
# per key.  Standard HLL error: 1.04/sqrt(256) ~ 6.5% relative.
# --------------------------------------------------------------------------

HLL_M = 256            # 2^8 registers (first 2 hex chars)
HLL_RHO_HEX = 13       # 52 tail bits scanned for the leading-zero run
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_ALPHA_NUM = _HLL_ALPHA * HLL_M * HLL_M * 2.0**53  # alpha*m^2 / 2^-53-scale


def _hex_clz(c: Column) -> Column:
    """Leading-zero bits of one lowercase hex char known to be nonzero."""
    return (
        F.when(c == "1", F.lit(3))
        .when(c.isin("2", "3"), F.lit(2))
        .when(c.between("4", "7"), F.lit(1))
        .otherwise(F.lit(0))
    )


def hll_cols(key: Column) -> tuple[Column, Column]:
    """(reg, rho) for one key — the portable HLL hash decomposition.

    The leading-zero run comes from ``length - length(ltrim(tail, '0'))``
    — a plain character scan, ~4x cheaper per row than the equivalent
    regexp and available verbatim in DuckDB (the oracle mirrors it)."""
    h = F.md5(key.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    tail = F.substring(h, 3, HLL_RHO_HEX)
    z = F.lit(HLL_RHO_HEX) - F.length(F.ltrim(tail, F.lit("0")))
    rho = F.when(z == HLL_RHO_HEX, F.lit(4 * HLL_RHO_HEX + 1)).otherwise(
        z * 4 + _hex_clz(F.substr(tail, z + 1, F.lit(1))) + 1
    )
    return reg, rho


def hll_build(df: DataFrame, key: Column, group_cols: list[str] | None = None) -> DataFrame:
    """Build per-group portable HLL sketches: (groups..., reg, rho).

    One map-side-combinable groupBy-max — shuffled state is bounded by
    groups x 256 rows, never by input size."""
    gcols = group_cols or []
    reg, rho = hll_cols(key)
    return (
        df.select(*gcols, reg.alias("reg"), rho.alias("_rho"))
        .groupBy(*gcols, "reg")
        .agg(F.max("_rho").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """union + register max: hll_build(A ∪ B) == hll_merge(...) exactly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    group = [c for c in out.columns if c != "rho"]
    return out.groupBy(*group).agg(F.max("rho").alias("rho"))


def hll_estimate(sketch: DataFrame, group_cols: list[str] | None = None, out_col: str = "estimate") -> DataFrame:
    """Cardinality estimate per group from a (groups..., reg, rho) sketch.

    All register arithmetic is integer (sum of 2^(53-rho) as long); the
    only float ops are one literal/int64 division and — in the
    small-range branch — m*ln(m/V), both bit-reproducible in SQL."""
    gcols = group_cols or []
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_np"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 53 - rho)")).alias("_sp"),
    )
    v = F.lit(HLL_M) - F.col("_np")  # empty registers
    s = F.col("_sp") + v.cast("long") * F.lit(1 << 53)
    e_raw = F.lit(_HLL_ALPHA_NUM) / s.cast("double")
    est = F.when(
        (e_raw <= 2.5 * HLL_M) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*gcols, est.alias(out_col))


def hll_overlap_portable(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Inclusion-exclusion overlap from portable HLL sketches (see
    ``hll_overlap`` for the DataSketches variant and the error envelope):
    |A ∩ B| ≈ |A| + |B| - |A ∪ B|, union = register max — no join, no
    rescan, and every number re-derivable by the DuckDB oracle."""
    sa = hll_build(a, F.col(key))
    sb = hll_build(b, F.col(key))
    if not sa.isStreaming:
        sa, sb = sa.localCheckpoint(), sb.localCheckpoint()  # each feeds 2 legs
    ea = hll_estimate(sa, out_col="est_a")
    eb = hll_estimate(sb, out_col="est_b")
    eu = hll_estimate(hll_merge(sa, sb), out_col="est_union")
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                (F.col("est_a") + F.col("est_b") - F.col("est_union")), F.lit(0.0)
            ).alias("est_intersection"),
        )
    )


def hll_rolling_distinct_portable(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    bucket: str = "hour",
    window_buckets: int = 24,
) -> DataFrame:
    """Trailing-window distinct counts from portable HLL sketches.

    Same plan shape as ``hll_rolling_distinct``: ONE event pass builds
    per-bucket register sketches; the rolling union is a range join of the
    bucket list against the sketch rows (both sketch-sized — buckets x
    <=256 rows) followed by a register max, so event volume never touches
    the rolling stage.  Output rows = buckets present in the data."""
    sec = {"minute": 60, "hour": 3600, "day": 86400}[bucket]
    per = hll_build(
        df.select(F.date_trunc(bucket, F.col(ts_col)).alias("_b"), key), F.col(key), ["_b"]
    )
    if not per.isStreaming:
        per = per.localCheckpoint()  # feeds the bucket list + the range join
    buckets = per.select(F.col("_b").alias("bucket")).distinct()
    lo = F.col("bucket").cast("long") - (window_buckets - 1) * sec
    merged = (
        buckets.join(
            per,
            (F.col("_b").cast("long") >= lo) & (F.col("_b") <= F.col("bucket")),
        )
        .groupBy("bucket", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    return hll_estimate(merged, ["bucket"], out_col="rolling_distinct")


def hll_overlap(
    a: DataFrame,
    b: DataFrame,
    key: str,
) -> DataFrame:
    """Audience-overlap estimate from HLL sketches (inclusion-exclusion).

    |A ∩ B| ≈ |A| + |B| - |A ∪ B|, with all three cardinalities estimated
    from two DataSketches HLL sketches — the union comes from merging the
    sketches, so neither input is rescanned or joined.  The classic
    marketing/dedup-planning primitive: at 100 TB each side is one
    map-side-combinable sketch aggregate, and the overlap math runs on two
    sketch blobs.  Relative error follows the HLL envelope (~1.6% at the
    default lgConfigK=12), amplified in the subtraction when the true
    overlap is small — pytest pins the envelope.
    """
    sa = a.agg(F.hll_sketch_agg(key).alias("sk")).localCheckpoint()
    sb = b.agg(F.hll_sketch_agg(key).alias("sk")).localCheckpoint()
    both = sa.unionByName(sb)
    est_union = both.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_union")
    )
    ea = sa.select(F.hll_sketch_estimate("sk").alias("est_a"))
    eb = sb.select(F.hll_sketch_estimate("sk").alias("est_b"))
    return (
        ea.crossJoin(eb)
        .crossJoin(est_union)
        .select(
            "est_a",
            "est_b",
            "est_union",
            F.greatest(
                (F.col("est_a") + F.col("est_b") - F.col("est_union")), F.lit(0)
            ).alias("est_intersection"),
        )
    )


def hll_rolling_distinct(
    df: DataFrame,
    key: str,
    ts_col: str = "ts",
    bucket: str = "hour",
    window_buckets: int = 24,
    group: str | None = None,
) -> DataFrame:
    """Rolling-window distinct counts from HLL sketches — "unique users in
    the trailing 24 h", per bucket, without ever re-scanning raw events.

    Exact sliding distinct is quadratic in practice (each of N windows
    re-deduplicates its span); the mergeable-sketch form is the standard
    production answer: ONE pass builds a per-bucket sketch (map-side
    combinable, state bounded by buckets x sketch size), then
    ``hll_union_agg`` runs as a window aggregate over the bucket table —
    windows x sketch-merge cost, independent of event volume.  The frame is
    ``rangeBetween`` on epoch seconds, so sparse buckets still get
    time-correct windows (a rows-frame would silently widen them).
    """
    from pyspark.sql import Window

    sec = {"minute": 60, "hour": 3600, "day": 86400}[bucket]
    gcols = [group] if group else []
    per = df.groupBy(
        *gcols, F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    ).agg(F.hll_sketch_agg(key).alias("_sk"))
    w = (
        Window.partitionBy(*gcols)
        .orderBy(F.col("bucket").cast("long"))
        .rangeBetween(-(window_buckets - 1) * sec, 0)
    )
    return per.select(
        *gcols,
        "bucket",
        F.hll_sketch_estimate(F.hll_union_agg("_sk").over(w)).alias("rolling_distinct"),
    )


# --------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch: the third member of
# the mergeable-sketch family (CMS = frequency, HLL = distinct via
# registers, KMV = distinct via order statistics).  KMV's advantage over
# HLL is LOSSLESS set algebra on the sketch: bottom-k(distinct(A ∪ B)) is
# computable exactly from bottom-k(A) and bottom-k(B), so merged-sketch
# estimates are bit-identical to direct estimates (pinned in pytest), and
# the kth order statistic supports intersection/Jaccard extensions the
# HLL register array cannot express exactly.
#
# Hash = first 15 hex chars of md5 (60 bits, < 2^63 — long-safe under
# ANSI), identical in DuckDB as CAST(concat('0x', substr(md5(k),1,15)) AS
# BIGINT), so estimates are engine-portable like the md5 HLL above.
# --------------------------------------------------------------------------

KMV_BITS = 60  # 15 md5 hex chars; hash domain [0, 2^60)


def kmv_hash(key: Column) -> Column:
    """60-bit md5-derived hash as BIGINT (engine-portable, deterministic)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def kmv_build(
    df: DataFrame,
    key: Column,
    k: int = 64,
    group_cols: list[str] | None = None,
    prereduce: bool = True,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest DISTINCT 60-bit hashes, as
    (groups..., pos, hv) rows with pos = 1..k ordered by hv.

    Scale shape: with ``prereduce`` (default), an Arrow pass keeps only
    each in-memory batch's k smallest distinct hashes BEFORE any shuffle,
    so the shuffled volume is <= groups x k x n_batches rows instead of
    one row per distinct key.  The pre-reduction is provably lossless: a
    hash outside its batch's bottom-k has k smaller hashes in the same
    group globally, so it cannot be in the global bottom-k.  The final
    window therefore ranks a tiny survivor set; the pure-SQL oracle
    replays the window over all distinct hashes and gets the identical
    result by that argument.
    """
    import pandas as pd  # noqa: F401 (arrow path)

    gcols = group_cols or []
    src = df.select(*gcols, kmv_hash(key).alias("hv"))
    if prereduce and gcols:
        schema = ", ".join(f"{c} string" for c in gcols) + ", hv long"

        def bottomk(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                yield (
                    pdf.drop_duplicates()
                    .sort_values([*gcols, "hv"])
                    .groupby(gcols, sort=False)
                    .head(k)
                )

        # group cols pass through as-is; only string group keys supported
        # on the arrow path (the corpus' group keys are strings)
        src = src.mapInPandas(bottomk, schema)
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("hv")
    return (
        src.groupBy(*gcols, "hv")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(*gcols, "hv", F.row_number().over(w).alias("pos"))
        .filter(F.col("pos") <= k)
    )


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Lossless union: re-rank the distinct hashes of the stacked sketches
    and keep the bottom k — exactly kmv_build on the concatenated input."""
    from pyspark.sql import Window

    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    gcols = [c for c in out.columns if c not in ("hv", "pos")]
    w = Window.partitionBy(*[F.col(c) for c in gcols]).orderBy("hv")
    return (
        out.select(*gcols, "hv")
        .distinct()
        .select(*gcols, "hv", F.row_number().over(w).alias("pos"))
        .filter(F.col("pos") <= k)
    )


def kmv_estimate(
    sketch: DataFrame,
    k: int = 64,
    group_cols: list[str] | None = None,
    out_col: str = "estimate",
) -> DataFrame:
    """Distinct-count estimate per group: (k-1)/U(h_k) with U the hash
    normalized to (0,1); exact count when the group holds < k hashes.

    Arithmetic portability: (k-1) * 2^60 is computed as a DOUBLE product
    of two exactly-representable doubles (k-1 small, 2^60 a power of
    two), the divide is one correctly-rounded IEEE op on both engines,
    and the 3dp round ends it — same discipline as the md5 HLL."""
    gcols = group_cols or []
    agg = sketch.groupBy(*gcols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("hv").alias("_hk"),
    )
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(
        F.round(
            F.lit(float(k - 1)) * F.lit(float(1 << KMV_BITS)) / F.col("_hk").cast("double"),
            3,
        )
    )
    return agg.select(*gcols, est.alias(out_col))
