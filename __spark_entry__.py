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


# Round-5 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  Slots 1-50: the one r04 red row
# (ab_test_event_values, re-fixed this round with an all-BIGINT certified
# projection) then 49 queries never sampled in r01-r04 (TPC-H analytics
# first, then the round-4 session additions, including the three orphans —
# decayed_engagement_users, km_retention_curve, textrank_keywords — that
# were registered but absent from every earlier prefix).  Slots 51+: the
# 10 remaining never-sampled names (queued first for r06) and then this
# round's new queries.  Nothing is ever dropped: certified queries stay
# registered afterwards.
_ROUND5_PREFIX = [
    # r04 red row, re-fixed this round (pure-integer projection) — slot 1.
    "ab_test_event_values",
    # TPC-H-style analytics never sampled in r01-r04.
    "stats_by_returnflag", "percentiles_by_status",
    "exists_orders_by_priority", "filter_agg_revenue",
    "shipping_priority_topk", "returned_items_topk",
    "argmin_supplier_per_nation", "volume_shipping_pairs",
    "profit_by_nation_year", "local_supplier_volume", "nation_market_share",
    "top_revenue_supplier", "supplier_part_variety", "small_quantity_revenue",
    "priority_counts_by_linestatus", "customer_order_histogram",
    "promo_revenue_share", "large_order_customers",
    "disjunctive_part_revenue", "idle_rich_customers",
    "lag_daily_revenue_delta", "cube_order_counts", "waiting_suppliers",
    # Round-4 session additions never sampled (all local-green or
    # local-no_oracle in CORRECTNESS_local.json).
    "dsir_importance_weights", "ccnet_perplexity_buckets",
    "dedup_keep_best", "dolma_attribute_tags", "line_boilerplate_clean",
    "line_dedup_within_doc", "hard_negative_mining",
    "ssl_prototype_prune", "jaro_winkler_linkage",
    "unigram_lm_vocab", "unigram_lm_encode_sample", "embedding_pca_whiten",
    "roc_auc_purchase", "calibration_bins_purchase", "pr_threshold_metrics",
    "cohens_kappa_langid", "nb_train_lang", "nb_predict_lang",
    "pmi_type_value", "er_golden_record", "mmr_diverse_topk",
    "robust_outliers_by_type", "touch_attribution_channels",
    # The three orphans missing from every earlier prefix.
    "decayed_engagement_users", "km_retention_curve", "textrank_keywords",
    # ---- slot 51+ : r06 queue (never sampled, local-green) ----
    "bloom_semi_join_orders", "dataset_card_by_source", "domain_cap_sample",
    "dsir_gumbel_topk", "embedding_int8_quantize", "embedding_int8_topk",
    "leakage_safe_split", "pii_scan_summary", "url_blocklist_filter",
    "vocab_growth_curve",
    # Round-5 session additions (local-certified; see CORRECTNESS_local).
    "rrf_hybrid_fusion", "ks_drift_value", "chi2_token_lang",
    "rouge_l_pairs", "collocations_pmi", "trimmed_mean_by_type",
    "icws_weighted_near_dupes", "control_char_stats",
    "compression_ratio_quality", "lang_confusion_matrix",
    "brier_score_purchase", "phrase_contamination_scan",
    "ndcg_user_rankings", "gini_value_by_type", "map_user_rankings",
    "bootstrap_purchase_mean_ci", "permutation_test_values",
]
_ROUND5_RANK = {name: i for i, name in enumerate(_ROUND5_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND5_RANK.get(name, len(_ROUND5_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
