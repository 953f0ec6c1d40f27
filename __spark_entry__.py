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


# Round-10 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  Slots 1-12 are the queries NEW or
# CHANGED in round 10 (price_decile_grid is new — exact global decile
# grid on the per-rank interval selection) (the deterministic-bucket weighted-quantile rework that
# closes the one r09 hash-FAIL, icws newly promoted to a golden-parquet
# oracle — the corpus' last no-oracle row, the distributed-selection
# Theil-Sen median, the all-pairs Jensen-Shannon fix, the prenormalized
# kNN join, doc_fingerprint — unchanged code, but the other over-floor
# r09 bench row, re-certified for drift — plus the five riders on the
# late-r10 primitive reworks: percentiles_by_status /
# robust_outliers_by_type / trimmed_mean_by_type moved onto
# orderstats.interpolated_quantiles_by_group, and kruskal_wallis_values /
# spearman_spend_vs_orders ride the width-bucket _rank2 rework, and —
# late-session — roc_auc_purchase / mann_whitney_values / ks_drift_value
# / zipf_slope moved onto orderstats.bucketed_cumsum with the NULL-
# bucket fix, so they lead too, and — final session — the five riders
# on the multi-scan eliminations: ccnet_perplexity_buckets /
# dolma_attribute_tags on the rank_buckets ReuseExchange totals,
# line_boilerplate_clean on the one-aggregation line dedup, and
# nb_train_lang / nb_predict_lang on the materialized NB model grid);
# the remaining slots rotate the OLDEST still-unrotated certified
# queries (r01 residue, the two r02 rows, and the alphabetical head of
# the r03 cohort), guarding long-untouched operators against silent
# drift.  Exactly 50 slots, zero fall-through.  Nothing is ever
# dropped: certified queries stay registered.
_ROUND10_PREFIX = [
    # ---- slots 1-21: new or changed (or perf-flagged) in round 10 ----
    "price_decile_grid",
    "weighted_median_price_by_flag", "icws_weighted_near_dupes",
    "trend_daily_revenue", "js_divergence_sources", "embedding_knn_join",
    "doc_fingerprint", "percentiles_by_status", "robust_outliers_by_type",
    "trimmed_mean_by_type", "kruskal_wallis_values",
    "spearman_spend_vs_orders",
    "roc_auc_purchase", "mann_whitney_values", "ks_drift_value",
    "zipf_slope",
    "ccnet_perplexity_buckets", "dolma_attribute_tags",
    "line_boilerplate_clean", "nb_train_lang", "nb_predict_lang",
    # ---- slots 22-27: the session-5 reworks (ngram posting frame is the
    # r01-residue slot below; these are its consumers plus the pagerank /
    # bloom riders not already listed) ----
    "dedup_cc_clusters", "dedup_keep_best", "leakage_safe_split",
    "er_golden_record", "textrank_keywords", "bloom_semi_join_orders",
    # ---- slots 28-33: the r01-certified residue ----
    "bpe_token_count", "embedding_cosine_topk", "lang_id_pred",
    "ngram_jaccard_pairs", "text_quality", "token_frequencies",
    # ---- slots 34-35: the r02 cohort ----
    "html_strip", "pii_redact",
    # ---- slots 36-50: alphabetical head of the r03 cohort (six rows of
    # the head yielded their slots to the session-5 reworks above —
    # changed code outranks drift guards; they stay registered and
    # rotate back in r11) ----
    "ab_test_event_values", "audience_overlap_matrix",
    "bloom_incremental_dedup", "chi2_type_vs_daypart", "data_quality_check",
    "data_quality_profile", "ddsketch_value_quantiles",
    "dominant_part_suppliers",
    "event_transition_probs", "frequent_part_pairs",
    "funnel_conversion_deadline",
    "gopher_filter_verdicts",
    "grouping_sets_revenue", "kn_bigram_logprob",
    "pagerank_trade_graph",
]
_ROUND10_RANK = {name: i for i, name in enumerate(_ROUND10_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND10_RANK.get(name, len(_ROUND10_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
