"""Regenerate docs/PLANS.md — physical-plan audit of representative queries.

Usage: python docs/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_morphlines_spark import get_spark  # noqa: E402
from kafka_connect_morphlines_spark.plans.queries import QUERIES  # noqa: E402

NAMES = [
    "read_json_typed",
    "contains_filter",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "shipping_priority_topk",
    "filter_agg_revenue",
    "sort_topn_lineitems",
    "window_topk_orders",
    "dedup_exact",
    "asof_join_events",
    "range_join_bucketed",
    "text_quality",
    "volume_shipping_pairs",
    "customer_order_histogram",
    "disjunctive_part_revenue",
    "large_order_customers",
    "cube_order_counts",
    "session_window_agg",
    "quality_classifier_score",
    "span_dedup_clean",
    "url_canonical_dedup",
    "zorder_values",
    "semantic_centroid_assign",
    "semantic_dedup",
    "bloom_incremental_dedup",
    "data_quality_profile",
    "gopher_filter_verdicts",
    "hll_sketch_rollup",
    "inverted_index_stats",
    "bm25_topk_search",
    "bigram_logprob",
    "scd2_order_versions",
    "pit_join_ship_state",
    "funnel_conversion",
    "cohort_retention_weekly",
    "ddsketch_value_quantiles",
    "weighted_sample_docs",
    "pagerank_trade_graph",
    "event_transition_probs",
    "zscore_hourly_anomalies",
    "value_histogram_by_type",
    "kn_bigram_logprob",
    "fuzzy_join_part_names",
    "frequent_part_pairs",
    "tfidf_top_terms",
    "latest_state_per_user",
    "audience_overlap_matrix",
    "psi_value_drift",
    "winnow_fingerprint_index",
    "winnow_overlap_pairs",
    "normalized_dedup_keys",
    "dsir_importance_weights",
    "dsir_gumbel_topk",
    "ccnet_perplexity_buckets",
    "dedup_keep_best",
    "dolma_attribute_tags",
    "line_boilerplate_clean",
    "domain_cap_sample",
    "vocab_growth_curve",
    "hard_negative_mining",
    "embedding_int8_quantize",
    "embedding_int8_topk",
    "leakage_safe_split",
    "line_dedup_within_doc",
    "dataset_card_by_source",
    "pii_scan_summary",
    "url_blocklist_filter",
    "nb_train_lang",
    "nb_predict_lang",
    "roc_auc_purchase",
    "rrf_hybrid_fusion",
    "ks_drift_value",
    "chi2_token_lang",
    "collocations_pmi",
    "trimmed_mean_by_type",
    "icws_weighted_near_dupes",
    "control_char_stats",
    "phrase_contamination_scan",
    # round-7 promotions / additions
    "dedup_minhash_lsh",
    "dedup_simhash",
    "hll_audience_overlap",
    "hll_rolling_distinct_users",
    "approx_sketches",
    "pq_encode_codes",
    "pq_topk_adc",
    "sample_seeded",
    "multimodal_features",
    "rouge_l_pairs",
    "mrr_user_rankings",
    "gumbel_stratified_sample",
    "quantile_normalize_chars",
    "interleave_sources_order",
    "route_by_schema_docs",
    "lang_prf_report",
    "kmeans_cluster_stats",
    "temperature_quota_sample",
    "cdc_chunk_stats",
    "source_overlap_matrix",
    "chunk_sliding_windows",
    "detect_mime_type",
    "read_xml_roundtrip",
    "user_agent_parse",
    "krippendorff_alpha_langid",
    "kmv_distinct_users",
    "bradley_terry_events",
    "pca_power_component",
    "triangle_count_cosupply",
    "tokenizer_fertility_by_lang",
    "acf_daily_revenue",
    "spearman_spend_vs_orders",
    "trend_daily_revenue",
    "cusum_changepoint_revenue",
    "anova_value_by_type",
    "benford_first_digit_prices",
    "bpe_merge_rules",
    "unigram_lm_vocab",
    "embedding_pca_whiten",
]

# Every bench.py HEADLINE query must have a PLANS.md section — the list
# drifted twice (r07 NAMES miss, r08 anova/benford lag), so the union is
# now computed instead of maintained by hand, and
# tests/test_plan_guardrails.py::test_plans_md_covers_headline fences it.
from bench import HEADLINE  # noqa: E402

NAMES = list(dict.fromkeys(NAMES + [n for n in HEADLINE if n not in NAMES]))


def audit(spark, sf: str, name: str) -> dict:
    df = QUERIES[name].build(spark, sf)
    # Execute first: under AQE the pre-execution plan is the un-finalized
    # AdaptiveSparkPlan, which hides the *(N) whole-stage-codegen markers
    # and the runtime join-strategy picks.  collect() runs the dataframe's
    # own QueryExecution (a separate write action would get its own), and
    # the audited counts then reflect what AQE actually ran.  The executed
    # toString appends an "== Initial Plan ==" echo — strip it so nodes
    # aren't double-counted.
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    plan = re.split(r"== Initial Plan ==", plan)[0]
    codegen_ids = set(re.findall(r"\*\((\d+)\)", plan))
    return {
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "exchanges": plan.count("Exchange"),
        "codegen_spans": len(codegen_ids),
        "take_ordered": "TakeOrderedAndProject" in plan,
        "read_schemas": [s[:100] for s in re.findall(r"ReadSchema: (struct<[^\n]*)", plan)[:3]],
        "pushed_filters": [p[:110] for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p][:3],
    }


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gen_plans", extra_conf={"spark.ui.showConsoleProgress": "false"})
    lines = [
        "# PLANS — physical-plan audit (generated against " + sf + ")",
        "",
        "Evidence that the declarative compilation keeps Catalyst's optimizations",
        "intact: predicate pushdown into parquet, column pruning, broadcast joins,",
        "whole-stage codegen, TakeOrderedAndProject for top-k.",
        "Regenerate with `python docs/gen_plans.py`.",
        "",
    ]
    for n in NAMES:
        a = audit(spark, sf, n)
        lines.append(f"## {n}")
        lines.append("")
        summary = (
            f"- broadcast joins: {a['broadcast_joins']}, sort-merge joins: {a['smj']}, "
            f"exchanges: {a['exchanges']}, whole-stage-codegen spans: {a['codegen_spans']}"
        )
        if a["take_ordered"]:
            summary += ", TakeOrderedAndProject: yes"
        lines.append(summary)
        for s in a["read_schemas"]:
            lines.append(f"- ReadSchema: `{s}`")
        for p in a["pushed_filters"]:
            lines.append(f"- PushedFilters: `{p}`")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PLANS.md")
    with open(out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
