"""End-to-end event-warehouse analytics on the engine's operator library.

The serving-side composition a 100 TB event warehouse runs daily,
demonstrated on the test tables: SCD2 dimension build from the raw change
stream -> point-in-time enrichment of the fact stream -> ordered funnel +
weekly cohort retention over the enriched events -> count-min heavy-hitter
monitor -> BM25 document search for the audit trail.

Every stage is a DataFrame -> DataFrame operator: one lazy plan per output,
Catalyst optimizing across stage boundaries (the funnel's event-type
filters push down to the same scan the enrichment reads).  Run directly:

    python examples/warehouse_analytics.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from kafka_connect_morphlines_spark.functions import funnel, retrieval, sketches, temporal


def analyze_events(
    events: DataFrame,
    docs: DataFrame | None = None,
    search_terms: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Returns the analytics frames plus the intermediate audit frames."""
    # 1. SCD2 dimension: each user's purchase history becomes versioned
    #    state rows (valid_from/valid_to/version) — one key-partitioned
    #    window, no self-join
    changes = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_purchases"), F.round(F.sum("value"), 2).alias("spent"))
    )
    versions = temporal.scd2_versions(changes, "user_id", "day", ["n_purchases", "spent"])

    # 2. point-in-time enrichment: every click sees the purchase-state
    #    version valid at click time (as-of union+window: one key shuffle)
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    enriched = temporal.point_in_time_join(
        clicks,
        versions.select("user_id", "valid_from", "version", "spent"),
        key="user_id",
        fact_ts="ts",
        value_cols=["version", "spent"],
    )

    # 3. behavioral analytics over the raw stream
    steps = ["signup", "click", "purchase"]
    fun = funnel.funnel_steps(events, steps)
    conversion = funnel.funnel_counts(fun, steps)
    retention = funnel.cohort_retention(events, "signup")

    # 4. heavy-hitter monitor: bounded-state frequency sketch of the user
    #    key — the thing you alert on when one key starts dominating the
    #    stream (and the skew signal for salting decisions)
    hitters = sketches.cms_heavy_hitters(events, F.col("user_id"), k=10)

    out = {
        "dim_versions": versions,
        "enriched_clicks": enriched,
        "funnel": fun,
        "conversion": conversion,
        "retention": retention,
        "heavy_hitters": hitters,
    }

    # 5. audit search: which documents mention the incident terms
    if docs is not None and search_terms:
        out["audit_search"] = retrieval.bm25_topk(docs, search_terms, k=10)
    return out


if __name__ == "__main__":
    from kafka_connect_morphlines_spark import get_spark
    from kafka_connect_morphlines_spark.sources.files import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    out = analyze_events(events, docs, search_terms=["spark", "window"])
    for name, frame in out.items():
        print(f"{name}: {frame.count()} rows")
