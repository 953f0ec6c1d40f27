"""Temporal-table operators: SCD2 version building and point-in-time joins.

The reference engine enriches records against *current* side data (a
morphline chain consulting a schema registry or Solr before loading —
/root/reference/src/main/java/.../EnrichJsonBuilder.java:191-200); a
warehouse needs the time-aware version of that enrichment: reconstruct the
dimension state that was valid when each fact happened.  These operators
express that Spark-first:

- :func:`scd2_versions` turns an append-only change stream into
  slowly-changing-dimension type-2 rows (valid_from / valid_to / version /
  is_current) with one key-partitioned window — shuffle on the key only,
  no self-join.
- :func:`point_in_time_join` matches each fact to the version valid at the
  fact's timestamp via the union + last_value window formulation
  (functions/relational.asof_join) — one shuffle on the key, no range-join
  explosion, no per-group pandas.  An optional validity guard drops matches
  whose version had already expired (relevant when versions are pruned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from kafka_connect_morphlines_spark.functions.relational import asof_join


def scd2_versions(
    changes: DataFrame,
    key: str,
    ts: str,
    attrs: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Append-only change rows -> SCD2 dimension versions.

    Input must have one row per (key, ts) — pre-aggregate if several changes
    can share a timestamp, otherwise version numbering is nondeterministic.
    Output: key, attrs, valid_from=ts, valid_to=next change's ts (null for
    the current version), version (1-based per key), is_current.

    One window over (key ORDER BY ts): a single hash shuffle on the key —
    the same cost as a groupBy, and each key's history sorts independently so
    skew is bounded by the busiest key's version count, not table size.
    """
    w = Window.partitionBy(key).orderBy(ts)
    return changes.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts).alias(valid_from),
        F.lead(ts).over(w).alias(valid_to),
        F.row_number().over(w).alias("version"),
        F.lead(ts).over(w).isNull().alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    fact_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: list[str] | None = None,
    suffix: str = "",
    enforce_valid_to: bool = False,
) -> DataFrame:
    """Each fact row picks the dimension version valid at its timestamp:
    the version with the greatest ``valid_from <= fact_ts`` per key.

    Built on the as-of union + window (one key shuffle) rather than a
    ``valid_from <= ts < valid_to`` range join, which Spark would plan as a
    key-equi join with a residual — correct, but it replicates every fact
    against every version of its key before filtering; the as-of form never
    forms those intermediate pairs.  With contiguous SCD2 histories the
    upper bound is implied (the next version's valid_from IS this one's
    valid_to); set ``enforce_valid_to`` when versions can be closed without
    a successor (hard deletes), which null-matches facts after the close.
    """
    value_cols = value_cols or [
        c for c in versions.columns if c not in (key, valid_from)
    ]
    sfx = suffix or "_asof"
    out = asof_join(
        facts,
        versions,
        fact_ts,
        valid_from,
        by=key,
        value_cols=value_cols,
        suffix=sfx,
    )
    if enforce_valid_to and valid_to in value_cols:
        vt = F.col(valid_to + sfx)
        expired = vt.isNotNull() & (F.col(fact_ts) >= vt)
        out = out.select(
            *[c for c in facts.columns],
            *[
                F.when(expired, F.lit(None)).otherwise(F.col(c + sfx)).alias(c + sfx)
                for c in value_cols
            ],
        )
    return out


def enrich_scd2_stream(
    stream: DataFrame,
    versions: DataFrame,
    key: str,
    ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Stream-side point-in-time enrichment against a STATIC SCD2 dimension:
    each streaming fact joins the version that was valid at its event time
    (not the current one — the batch `point_in_time_join`'s streaming twin).

    Stream-static joins need no watermark and keep no state: the static
    side broadcasts (dimensions are small next to 100 TB facts), and the
    validity-window condition `valid_from <= ts < coalesce(valid_to, inf)`
    is evaluated per joined row.  Facts older than the key's first version
    pass through with null attributes (left join) rather than dropping —
    at-least-once pipelines must not lose facts to dimension lag.
    """
    v = F.broadcast(versions).alias("v")
    s = stream.alias("s")
    cond = (
        (F.col(f"s.{key}") == F.col(f"v.{key}"))
        & (F.col(f"v.{valid_from}") <= F.col(f"s.{ts}"))
        & (
            F.col(f"v.{valid_to}").isNull()
            | (F.col(f"s.{ts}") < F.col(f"v.{valid_to}"))
        )
    )
    return s.join(v, cond, "left").drop(F.col(f"v.{key}"))
