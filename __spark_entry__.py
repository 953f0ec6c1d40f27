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


# Round-9 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  After r08 the union reached 251/253
# with nothing uncertified, so this round's 50 slots rotate (VERDICT r08
# next-round #7): slots 1-10 are the queries CHANGED OR ADDED in round 9
# (the ANOVA division-parity fix, the HUGEINT power oracle, the
# distributed-_rank2 Spearman, the unigram NULL-text fix, exact trend
# replayed alongside its new Siegel fast mode, compression_ratio_quality
# newly promoted to a golden-parquet oracle, and the new Kruskal-Wallis /
# Brown-Forsythe / Jensen-Shannon / weighted-order-statistic operators);
# slots 12-50 re-certify the 39 OLDEST r01-certified queries against the
# current engine, guarding long-untouched operators against silent drift.
# Exactly 50 slots, zero fall-through.  Nothing is ever dropped:
# certified queries stay registered.
_ROUND9_PREFIX = [
    # ---- slots 1-11: changed or added in round 9 ----
    "anova_value_by_type", "pca_power_component", "spearman_spend_vs_orders",
    "unigram_lm_encode_sample", "trend_daily_revenue",
    "trend_daily_revenue_fast", "compression_ratio_quality",
    "kruskal_wallis_values", "brown_forsythe_values", "js_divergence_sources",
    "weighted_median_price_by_flag",
    # ---- slots 12-50: the 39 oldest r01-certified queries, re-certified ----
    "read_json_typed", "extract_json_paths", "set_values_template",
    "generate_uuid_deterministic", "convert_timestamp_millis", "find_replace",
    "split_field", "split_key_value", "extract_uri", "grok_extract",
    "translate_dict", "contains_filter", "not_equals_filter", "if_then_else",
    "try_rules", "head_sorted", "read_csv_lines", "read_line_explode",
    "read_multi_line", "enrich_json_conform", "to_connect_data_projection",
    "from_connect_data_json", "agg_pricing_summary", "join_revenue_by_nation",
    "window_topk_orders", "window_running_sum", "sessionize",
    "anti_join_customers", "semi_join_intersect", "except_low_priority",
    "distinct_count_by_nation", "rollup_counts", "pivot_event_counts",
    "orders_by_month", "event_time_tumbling_window", "string_functions",
    "math_functions", "sort_topn_lineitems", "dedup_exact",
]
_ROUND9_RANK = {name: i for i, name in enumerate(_ROUND9_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND9_RANK.get(name, len(_ROUND9_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
