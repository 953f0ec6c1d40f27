"""End-to-end service-observability pipeline on the engine's operator library.

The monitoring composition an event platform runs continuously,
demonstrated on the test tables: morphline parse of the raw event payload
-> per-hour z-score anomaly flags -> DDSketch latency-style quantile
rollup (per key + merged fleet-wide, no rescan) -> trailing-24h unique
users from HLL sketches -> Markov event-transition matrix for behavioral
drift -> PageRank over the user<->event-type interaction graph to rank
load-bearing event types.

Every stage is a DataFrame -> DataFrame operator on ONE parsed frame;
sketch outputs are mergeable tables, so daily partials roll up into weekly
and monthly views by union + re-aggregate, never by rescanning events.
Run directly:

    python examples/observability_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from kafka_connect_morphlines_spark.functions import funnel, sketches, timeseries, web
from kafka_connect_morphlines_spark.pipeline import compile_pipeline


def monitor_events(events: DataFrame) -> dict[str, DataFrame]:
    """Returns the monitoring frames keyed by dashboard panel."""
    # 1. morphline parse: the JSON props payload becomes a typed column —
    #    the same compiled pipeline path the SMT/sink drivers use
    pipe = compile_pipeline([{"readJson": {"inputField": "props", "schemaDdl": "k int"}}])
    parsed = pipe(events).select("event_id", "ts", "user_id", "event_type", "value")

    # 2. anomaly panel: hours whose value total deviates >3 sigma from the
    #    event type's own distribution (decimal-exact moments -> portable z)
    anomalies = timeseries.zscore_anomalies(parsed, z_threshold=3.0)

    # 3. quantile panel: p50/p95/p99 per event type as a mergeable DDSketch,
    #    plus the fleet-wide quantiles from merging the per-key sketches
    sk = sketches.dd_sketch(parsed, F.col("value"), keys=[F.col("event_type")]).localCheckpoint()
    per_key_q = sketches.dd_quantiles(sk, [0.5, 0.95, 0.99], key_cols=["event_type"])
    fleet_q = sketches.dd_quantiles(sketches.dd_merge(sk.drop("event_type")), [0.5, 0.95, 0.99])

    # 4. audience panel: trailing-24h unique users per hour — one scan
    #    builds hourly HLL sketches, the rolling union runs over buckets
    rolling_users = sketches.hll_rolling_distinct(parsed, "user_id", window_buckets=24)

    # 5. behavior panel: what users do next (first-order Markov matrix);
    #    week-over-week drift in these probabilities flags UX regressions
    transitions = funnel.event_transitions(parsed)

    # 6. dependency panel: PageRank over the user<->event-type bipartite
    #    interaction graph ranks load-bearing event types
    pairs = parsed.select(
        F.col("user_id").alias("c"),
        (F.hash("event_type").cast("long").bitwiseAND(F.lit((1 << 40) - 1)) + (1 << 41)).alias("s"),
    ).distinct()
    edges = pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionByName(
        pairs.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    ).distinct()
    ranks = web.pagerank(edges, iters=3).filter(F.col("id") >= (1 << 41))

    return {
        "anomalies": anomalies,
        "quantiles_per_key": per_key_q,
        "quantiles_fleet": fleet_q,
        "rolling_users": rolling_users,
        "transitions": transitions,
        "event_type_ranks": ranks,
    }


def main() -> None:
    from kafka_connect_morphlines_spark import get_spark
    from kafka_connect_morphlines_spark.sources.files import load_table

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="observability_pipeline")
    frames = monitor_events(load_table(spark, sf_dir, "events"))
    for name, df in frames.items():
        print(f"== {name}")
        df.show(8, truncate=False)


if __name__ == "__main__":
    main()
