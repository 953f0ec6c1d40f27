"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over ``kafka_connect_morphlines_spark.plans.queries`` — the
operator-coverage corpus (one entry per SURVEY.md §2 operator + the
LLM-pipeline operators), each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_morphlines_spark.plans.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["join_revenue_by_nation"].build(spark, "/root/testdata/sf0.001")


# Round-11 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  Slots 1-6 are the queries CHANGED
# in round 11 (optimization round 2): weighted_median_price_by_flag (the
# two-round driver hash-FAIL, root-caused to its DECIMAL output columns
# — the only ones in the corpus — and fixed by casting the output
# boundary to DOUBLE on both engines), ssl_prototype_prune +
# kmeans_cluster_stats (literal centroid map -> broadcast centroid-frame
# join), pagerank_trade_graph + textrank_keywords (pair-frame
# materialization, lazy per-round rank checkpoints, compact-decimal
# contribution sums), and icws_weighted_near_dupes (per-vocabulary-token
# CWS draws behind a scale-adaptive gate; inline plan at bench scale).
# The remaining 44 slots rotate the STALEST driver certifications
# (computed from the CORRECTNESS_r01..r10 files: the 28 queries last
# hash-certified in r03 — including revenue_concentration, whose r10
# _rank2 rework never re-entered a driver prefix — then the alphabetical
# head of the r04 cohort), guarding long-untouched operators against
# silent drift.  Exactly 50 slots, zero fall-through.  Nothing is ever
# dropped: certified queries stay registered.
_ROUND11_PREFIX = [
    # ---- slots 1-6: changed in round 11 ----
    "weighted_median_price_by_flag", "ssl_prototype_prune",
    "kmeans_cluster_stats", "pagerank_trade_graph", "textrank_keywords",
    "icws_weighted_near_dupes",
    # ---- slots 7-34: the r03-stale cohort (last driver-green r03) ----
    "dau_wau_stickiness", "encode_documents_ids", "fuzzy_join_part_names",
    "grouped_regression_hourly", "latest_state_per_user",
    "map_functions_props", "normalize_tokenize_text", "psi_value_drift",
    "quality_classifier_score", "repeat_purchase_intervals",
    "revenue_concentration", "score_decile_lift", "score_pct_by_source",
    "semantic_centroid_assign", "semantic_dedup", "session_duration_stats",
    "session_window_agg", "snapshot_diff_docs", "span_dedup_clean",
    "stratified_sample_exact_k", "tfidf_top_terms", "top_event_paths",
    "udtf_split_sentences", "url_canonical_dedup",
    "value_histogram_by_type", "weighted_sample_docs", "zorder_values",
    "zscore_hourly_anomalies",
    # ---- slots 35-50: the alphabetical head of the r04-stale cohort ----
    "chunk_documents_windows", "cms_heavy_hitters",
    "cohort_retention_weekly", "confluent_wire_roundtrip",
    "cross_dedup_benchmark", "decontaminate_ngrams", "dup_ngram_stats",
    "enrich_json_wrap_unions", "extract_avro_tree_flatten",
    "funnel_conversion", "global_shuffle_order", "hash_split_assign",
    "inverted_index_stats", "k_anonymity_audit", "levenshtein_pairs",
    "mixture_sample_deterministic",
]
_ROUND11_RANK = {name: i for i, name in enumerate(_ROUND11_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND11_RANK.get(name, len(_ROUND11_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
