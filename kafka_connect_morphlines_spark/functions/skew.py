"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join handling covers sort-merge joins at runtime; explicit salting
is the tool for (a) skewed groupBy keys (one key owning a large share of
rows) and (b) broadcast-ineligible skewed joins.  Salting splits the hot key
across N sub-keys, pre-aggregates, then merges — the shuffle fan-in for any
single reducer drops by ~N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # partial counts merge by summing
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a salt on the group key.

    ``aggs`` maps output column -> (fn, input column) with fn in
    {sum, count, min, max} (the algebraic aggregates — a salted mean is
    sum+count merged at the end).  Phase 1 groups by (keys + salt) — hot keys
    split across ``salt`` reducers; phase 2 merges the partials by key.
    """
    for out, (fn, _) in aggs.items():
        if fn not in _MERGE:
            raise ValueError(f"salted_aggregate supports {sorted(_MERGE)} aggregates, got {fn!r} for {out!r} (a salted mean is sum+count merged afterwards)")
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    phase1_exprs = []
    for out, (fn, col) in aggs.items():
        expr = F.count(F.lit(1)) if fn == "count" else getattr(F, fn)(col)
        phase1_exprs.append(expr.alias(out))
    phase1 = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    phase2_exprs = [_MERGE[fn](out).alias(out) for out, (fn, _) in aggs.items()]
    return phase1.groupBy(*keys).agg(*phase2_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
) -> DataFrame:
    """Inner equi-join with the left side's hot keys split across ``salt``
    sub-keys and the right side replicated ``salt`` times.

    Use when the small side is too big to broadcast and the key is skewed.
    Replication factor = salt, so pick the smallest salt that flattens the
    hot key.
    """
    l_salted = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    r_salted = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return l_salted.join(r_salted, [key, "_salt"]).drop("_salt")
