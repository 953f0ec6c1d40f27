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


# Round-8 certification prefix.  The driver samples a bounded (50-entry)
# prefix of queries() per round; across rounds the union of CORRECTNESS_r*
# files must cover the whole corpus.  The 32 slots below are EXACTLY the
# queries that are hash-green in CORRECTNESS_local.json but have never
# been driver-hash-certified: slots 1-11 the round-7 oracle landings the
# stale r07 prefix missed (VERDICT.md next-round #1), slots 12-17 the
# round-8 session-1 additions, and the rest the session-2 additions and
# promotions (Krippendorff, KMV, Bradley-Terry, power iteration,
# triangles, fertility, ACF, BPE train+encode, Spearman, unigram-LM
# train+encode via the probability-product twin, quantized PCA whitening,
# Mann-Kendall/Theil-Sen, CUSUM).  The remaining ~18 sampled slots fall
# through to already-certified queries alphabetically (harmless
# re-certification).  Nothing is ever dropped: certified queries stay
# registered.
_ROUND8_PREFIX = [
    # r07 oracles, locally green, never driver-sampled — certify first.
    "dedup_minhash_lsh", "dedup_simhash",
    "hll_sketch_rollup", "hll_audience_overlap", "hll_rolling_distinct_users",
    "pq_encode_codes", "pq_topk_adc",
    "kmeans_cluster_stats", "sample_seeded",
    "multimodal_features", "temperature_quota_sample",
    # ---- slot 12+ : round-8 session additions (local-certified) ----
    "cdc_chunk_stats", "source_overlap_matrix", "chunk_sliding_windows",
    "detect_mime_type", "read_xml_roundtrip", "user_agent_parse",
    "krippendorff_alpha_langid", "kmv_distinct_users", "bradley_terry_events",
    "pca_power_component", "triangle_count_cosupply",
    "tokenizer_fertility_by_lang", "acf_daily_revenue",
    # r08: BPE train+encode promoted from rows-only to full SQL oracles
    "bpe_merge_rules", "bpe_encode_sample",
    "spearman_spend_vs_orders",
    "unigram_lm_vocab", "unigram_lm_encode_sample",
    "embedding_pca_whiten",
    "trend_daily_revenue",
    "cusum_changepoint_revenue",
    "anova_value_by_type", "benford_first_digit_prices",
]
_ROUND8_RANK = {name: i for i, name in enumerate(_ROUND8_PREFIX)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    ordered = sorted(
        QUERIES,
        key=lambda name: (_ROUND8_RANK.get(name, len(_ROUND8_PREFIX)), name),
    )
    return {name: QUERIES[name].build for name in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
