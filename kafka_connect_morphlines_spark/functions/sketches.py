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


def _bucket(i: Column, key: Column, width: int) -> Column:
    # 6 hex digits < 2^24: conv cannot overflow a long even under ANSI mode;
    # mirrored in SQL as CAST('0x'||substr(md5(i||':'||key),1,6) AS BIGINT)%w
    h = F.md5(F.concat(i.cast("string"), F.lit(":"), key.cast("string")))
    return (F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % width).alias("bucket")


def cms_sketch(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 1024,
    weight: Column | None = None,
) -> DataFrame:
    """Build a count-min sketch (i, bucket, cnt) over one pass of ``df``.

    ``weight`` (default 1 per row) supports pre-aggregated inputs.  The
    result has at most depth x width rows regardless of input size.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i")
    w = weight if weight is not None else F.lit(1)
    ex = df.select(key.alias("_k"), w.alias("_w")).select(rows, "_k", "_w")
    return (
        ex.select("i", _bucket(F.col("i"), F.col("_k"), width), "_w")
        .groupBy("i", "bucket")
        .agg(F.sum("_w").cast("long").alias("cnt"))
    )


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
    rows = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("i")
    ex = keys.select("*", rows).select("*", _bucket(F.col("i"), key, width))
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

    The candidate set is the input's distinct keys (exact heavy hitters are
    always in it; the sketch only decides the ranking), so the scan is one
    distinct plus one sketch build — both map-side combinable."""
    sk = cms_sketch(df, key, depth, width)
    cand = df.select(key.alias("_key")).distinct()
    est = cms_estimate(sk, cand, F.col("_key"), depth, width)
    return (
        est.select(F.col("_key").alias("key"), "est_count")
        .orderBy(F.col("est_count").desc(), F.col("key"))
        .limit(k)
    )
