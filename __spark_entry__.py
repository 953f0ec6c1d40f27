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


# Round-6 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  Slots 1-4: the four r05 hash-FAILs,
# all fixed this round (their DuckDB oracles left integer sum() columns as
# HUGEINT while Spark emits BIGINT; every one is now CAST ... AS BIGINT and
# a pytest gate, tests/test_oracle_types.py, forbids the bug class).
# Slots 5-31: the 27 queries never sampled in r01-r05 — this completes
# union(CORRECTNESS_r01..r06) over the whole 225-query corpus (the four
# queued HUGEINT repeats among them are fixed by the same cast sweep;
# permutation_test_values / ndcg / map additionally carry this round's
# semantics fixes).  Slots 32+: round-6 session additions as they land.
# Nothing is ever dropped: certified queries stay registered afterwards.
_ROUND6_PREFIX = [
    # r05 hash-FAILs, oracle types fixed this round — re-sample first.
    "ab_test_event_values", "priority_counts_by_linestatus",
    "dsir_importance_weights", "line_dedup_within_doc",
    # Never sampled in r01-r05 (27 names; alphabetical).
    "bloom_semi_join_orders", "bootstrap_purchase_mean_ci",
    "brier_score_purchase", "chi2_token_lang", "collocations_pmi",
    "compression_ratio_quality", "control_char_stats",
    "dataset_card_by_source", "domain_cap_sample", "dsir_gumbel_topk",
    "embedding_int8_quantize", "embedding_int8_topk", "gini_value_by_type",
    "icws_weighted_near_dupes", "ks_drift_value", "lang_confusion_matrix",
    "leakage_safe_split", "map_user_rankings", "ndcg_user_rankings",
    "permutation_test_values", "phrase_contamination_scan",
    "pii_scan_summary", "rouge_l_pairs", "rrf_hybrid_fusion",
    "trimmed_mean_by_type", "url_blocklist_filter", "vocab_growth_curve",
    # ---- slot 32+ : round-6 session additions (local-certified) ----
    "route_by_schema_docs",
    # Promoted from rows-only to hash-certified this round (the md5
    # hyperplane family + the integer-scored MMR greedy gained exact
    # DuckDB oracles) — re-sample for hash certification.
    "embedding_random_projection", "embedding_ann_lsh",
    "embedding_near_dupes", "embedding_ivf_topk", "mmr_diverse_topk",
    "embedding_binary_hamming_topk", "mann_whitney_values",
    "interleave_sources_order", "event_time_hopping_window",
    "quantile_normalize_chars", "mrr_user_rankings",
    "gumbel_stratified_sample", "lang_prf_report",
]
_ROUND6_RANK = {name: i for i, name in enumerate(_ROUND6_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND6_RANK.get(name, len(_ROUND6_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
