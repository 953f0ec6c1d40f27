"""Distributed EXACT order statistics.

Spark's built-ins offer approx_percentile (sketch, not exact) and
percentile (exact but interpolated doubles, single-partition per group);
neither gives an engine-portable exact weighted quantile.  This module
computes exact weighted quantiles with the same distributed-ranking
discipline as evalmetrics._rank2 (r09): range-repartition the distinct
values, cumulate locally per partition, prefix-sum the bounded
per-partition totals on the driver — no single-partition window over
data-sized input anywhere.

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

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["weighted_quantiles_by_group", "weighted_quantile_by_group"]


def weighted_quantiles_by_group(
    df: DataFrame,
    group: Column,
    value: Column,
    weight: Column,
    quantiles: dict[str, tuple[int, int]],
) -> DataFrame:
    """Exact lower weighted quantiles of ``value`` weighted by ``weight``
    within each ``group`` — ALL requested quantiles from ONE pass.

    ``quantiles`` maps output column name -> (num, den), e.g.
    ``{"median": (1, 2), "p90": (9, 10)}``.  Returns one row per group:
    (grp, w_total, <name>...).  Group keys are stringified (the bounded
    driver offset tables round-trip through literal frames); weights must
    be positive.

    Scale shape (the r09 distributed-ranking discipline):
    1. one groupBy(group, value) collapses rows to distinct values with
       exact DECIMAL weight sums (map-side combined), CHECKPOINTED —
       repartitionByRange samples its input for boundaries and then
       shuffles it, so an un-materialized upstream would recompute the
       full-corpus groupBy twice more;
    2. the distinct frame is range-repartitioned by (group, value) —
       groups may straddle partition boundaries, which the offsets
       handle exactly;
    3. the cumulative weight runs PARTITIONED BY (partition id, group)
       (all cores busy, no data-sized single partition), checkpointed to
       freeze the range assignment for every downstream job;
    4. per-(partition, group) totals are prefix-summed on the DRIVER —
       bounded state: at most #partitions + #groups rows;
    5. each quantile's crossing row is picked from the SAME checkpointed
       frame by two exact DECIMAL-product comparisons —
       den*cum >= num*W > den*cum_before — exactly one row per group by
       construction; the k-row results broadcast-join on grp.
    """
    dec = "decimal(38,6)"
    per_v = (
        df.select(
            group.cast("string").alias("_g"), value.alias("_v"), weight.alias("_w")
        )
        .groupBy("_g", "_v")
        # (18,6) keeps the per-row weight long-backed through the corpus-
        # sized groupBy (a wider cast materializes a JVM BigDecimal per
        # row); Spark widens the SUM type automatically, so the per-value
        # weight totals stay exact
        .agg(F.sum(F.col("_w").cast("decimal(18,6)")).alias("_wv"))
    )
    # materialize ONCE: range-boundary sampling + the range shuffle both
    # read this; without it the corpus-sized groupBy runs 3x
    per_v = per_v.localCheckpoint()
    ranged = per_v.repartitionByRange(F.col("_g"), F.col("_v")).withColumn(
        "_pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("_pid", "_g").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = ranged.withColumn(
        "_before_local", F.coalesce(F.sum("_wv").over(w_local), F.lit(0).cast(dec))
    )
    local = local.localCheckpoint()  # freeze pids (totals job + every filter)
    totals = (
        local.groupBy("_pid", "_g").agg(F.sum("_wv").alias("_t")).collect()
    )  # bounded: <= #partitions + #groups rows
    from decimal import Decimal

    # per-group prefix offsets by ascending pid (range partitions are
    # ordered, so pid order IS value order within each group)
    by_group: dict = {}
    for r in sorted(totals, key=lambda r: (str(r["_g"]), r["_pid"])):
        key = r["_g"]
        acc, rows = by_group.setdefault(key, [Decimal(0), {}])
        rows[r["_pid"]] = acc
        by_group[key][0] = acc + Decimal(str(r["_t"]))
    w_total = {k: v[0] for k, v in by_group.items()}
    off_rows = [
        (k, pid, str(off))
        for k, (tot, pids) in by_group.items()
        for pid, off in pids.items()
    ]
    tot_rows = [(k, str(v)) for k, v in w_total.items()]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        off_rows, "_g string, _pid int, _off string"
    ).select("_g", "_pid", F.col("_off").cast(dec).alias("_off"))
    tot_df = spark.createDataFrame(tot_rows, "_g string, _wt string").select(
        "_g", F.col("_wt").cast(dec).alias("_wt")
    )
    joined = local.join(F.broadcast(off_df), ["_g", "_pid"]).join(
        F.broadcast(tot_df), "_g"
    )
    cum_before = F.col("_off") + F.col("_before_local")
    cum = cum_before + F.col("_wv")
    out = None
    for name, (q_num, q_den) in quantiles.items():
        # (4,0) x (38,6) stays within Spark's 38-precision cap (no silent
        # rounding of the product — the comparison must stay exact); a
        # (38,6) x (38,6) multiply would be precision-capped and rounded
        num = F.lit(q_num).cast("decimal(4,0)")
        den = F.lit(q_den).cast("decimal(4,0)")
        crossing = joined.filter(
            (den * cum >= num * F.col("_wt")) & (den * cum_before < num * F.col("_wt"))
        ).select(
            F.col("_g").alias("grp"),
            F.col("_wt").alias("w_total"),
            F.col("_v").alias(name),
        )
        if out is None:
            out = crossing
        else:
            out = out.join(crossing.drop("w_total"), "grp")
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
