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


# Round-4 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  These names were either NEVER sampled
# in r01-r03 or were red in r03 and are re-fronted after their fix — they
# sort first, in this exact order (SURVEY §2 operator legs, then the Avro
# wire path, then joins/TPC-H analytics, then the LLM-pipeline tail).
# Nothing is ever dropped: certified queries stay registered afterwards.
_ROUND4_PREFIX = [
    # r03 red rows, fixed this round — re-certify first.
    "ab_test_event_values", "bpe_encode_sample", "embedding_random_projection",
    # SURVEY §2 operator legs with no green row yet.
    "remove_fields_projection", "string_codec_roundtrip",
    "extract_avro_tree_flatten", "add_values_array",
    "avro_container_roundtrip", "confluent_wire_roundtrip",
    "enrich_json_wrap_unions",
    # Custom join operators.
    "asof_join_events", "range_join_bucketed", "pit_join_ship_state",
    "levenshtein_pairs", "scd2_order_versions",
    # Temporal / sessionization analytics.
    "resample_ffill_hourly", "rolling_event_stats", "funnel_conversion",
    "cohort_retention_weekly", "salted_agg_event_totals",
    # Retrieval / LLM-pipeline operators.
    "inverted_index_stats", "bm25_topk_search", "bigram_logprob",
    "decontaminate_ngrams", "pack_sequences_bins", "chunk_documents_windows",
    "hash_split_assign", "mixture_sample_deterministic", "dedup_cc_clusters",
    "global_shuffle_order", "dup_ngram_stats", "word_entropy",
    "unigram_logprob", "doc_fingerprint", "k_anonymity_audit",
    "temperature_mixture_rates", "cross_dedup_benchmark",
    "multimodal_binary_meta", "multimodal_features",
    "pq_encode_codes", "pq_topk_adc", "embedding_near_dupes",
    "embedding_ivf_topk", "approx_sketches", "hll_sketch_rollup",
    "cms_heavy_hitters",
    # Round-4 additions (winnowing family) — never sampled, oracle-backed.
    "winnow_fingerprint_index", "winnow_overlap_pairs",
    "winnow_containment_pairs", "normalized_dedup_keys",
    # TPC-H-style analytics never yet sampled.
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
    # Round-4 session additions (all locally certified green in
    # CORRECTNESS_local.json) — queued after the TPC-H tail for the r05+
    # windows; keep this ordering when rotating next round.
    "dsir_importance_weights", "dsir_gumbel_topk", "ccnet_perplexity_buckets",
    "dedup_keep_best", "dolma_attribute_tags", "line_boilerplate_clean",
    "line_dedup_within_doc", "domain_cap_sample", "vocab_growth_curve",
    "hard_negative_mining", "embedding_int8_quantize", "embedding_int8_topk",
    "leakage_safe_split", "dataset_card_by_source", "pii_scan_summary",
    "url_blocklist_filter",
    "bloom_semi_join_orders", "ssl_prototype_prune", "jaro_winkler_linkage",
    "unigram_lm_vocab", "unigram_lm_encode_sample", "embedding_pca_whiten",
    "roc_auc_purchase", "calibration_bins_purchase", "pr_threshold_metrics",
    "cohens_kappa_langid", "nb_train_lang", "nb_predict_lang",
    "pmi_type_value", "er_golden_record", "mmr_diverse_topk",
    "robust_outliers_by_type", "touch_attribution_channels",
]
_ROUND4_RANK = {name: i for i, name in enumerate(_ROUND4_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND4_RANK.get(name, len(_ROUND4_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
