"""Physical-plan guardrails: the plans docs/gen_plans.py audits are now
ASSERTED, so a regression (lost pushdown, lost broadcast, a cartesian
product sneaking into a join rewrite) fails CI instead of silently
shipping a 100TB-hostile plan.

Plans are taken AFTER execution (AQE-finalized) at sf0.001 — shape, not
speed, is under test.
"""

import os

import pytest

from kafka_connect_morphlines_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(spark, name: str) -> str:
    import re

    df = QUERIES[name].build(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.split(r"== Initial Plan ==", plan)[0]


# Queries whose joins must all be hash/broadcast joins: a CartesianProduct
# anywhere is a plan regression.  (Queries that intentionally cross-join
# 1-row aggregates compile to BroadcastNestedLoopJoin, which is fine and
# distinct from CartesianProduct.)
NO_CARTESIAN = [
    "join_revenue_by_nation",
    "shipping_priority_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard_pairs",
    "fuzzy_join_part_names",
    "asof_join_events",
    "hll_rolling_distinct_users",
    "interleave_sources_order",
    "mrr_user_rankings",
    "rouge_l_pairs",
    # r08 additions: CDC chunk stats joins source onto chunks; the overlap
    # matrix self-joins on the gram hash and completes zero pairs via a
    # broadcast cross of two m-row aggregates (BroadcastNestedLoopJoin ok)
    "cdc_chunk_stats",
    "source_overlap_matrix",
    "temperature_quota_sample",
    # r08 session-2: the triangle wedge join and closing probe are equi-
    # joins on (u[, rkw]); the degree/orientation joins are keyed; the
    # BT duel join is keyed on user; spearman joins its rank maps by
    # value; Krippendorff/trend aggregate without any join fan-out
    "triangle_count_cosupply",
    "bradley_terry_events",
    "spearman_spend_vs_orders",
    "krippendorff_alpha_langid",
    "kmv_distinct_users",
    # r08 session-2 tail (r09 catch-up): ANOVA is a pure two-level agg —
    # any join at all would be a regression; Benford joins the 9-row
    # expectation table broadcast and crosses the 1-row total (BNLJ ok)
    "anova_value_by_type",
    "benford_first_digit_prices",
    # r09: the Siegel pair table is an equi-inequality self-join of the
    # checkpointed day series (BroadcastNestedLoopJoin over a tiny frame,
    # never CartesianProduct)
    "trend_daily_revenue_fast",
    # r09: weighted quantiles join bounded broadcast offset/total tables
    # by (group, pid) / group — all keyed (r10: by (group, bucket))
    "weighted_median_price_by_flag",
    # r10: exact Theil-Sen's pair table is a BNLJ of the repartitioned
    # day series; the selection rounds add no joins at all
    "trend_daily_revenue",
    # r10: Gini ranks join the bounded bucket-offset table by bucket id;
    # the fact table never sorts or crosses
    "revenue_concentration",
    # r10: the all-pairs enumeration is an m-row broadcast NLJ, the
    # shared-token self-join stays keyed on token
    "js_divergence_sources",
    # r10: the decile grid's only join is the 9-row broadcast rank->decile
    # map; the selection rounds add no joins at all
    "price_decile_grid",
]


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_no_cartesian_product(spark, name):
    plan = _executed_plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product:\n{plan[:2000]}"


# (query, fragment that must appear in PushedFilters) — predicate pushdown
# reaching the parquet scan is the whole point of the declarative layer.
PUSHDOWN = [
    # NOTE: toString truncates long filter lists, so fragments must sit
    # near the front of the PushedFilters list
    ("filter_agg_revenue", "PushedFilters: [IsNotNull(l_shipdate)"),
    ("shipping_priority_topk", "EqualTo(c_mktsegment,BUILDING)"),
    ("rouge_l_pairs", "LessThan(doc_id,40)"),
    ("pq_topk_adc", "Not(EqualTo(vec_id,0))"),
]


@pytest.mark.parametrize("name,fragment", PUSHDOWN)
def test_filter_pushdown_reaches_scan(spark, name, fragment):
    plan = _executed_plan(spark, name)
    assert "PushedFilters: [" in plan, f"{name}: no pushed filters at all"
    assert fragment in plan, f"{name}: expected pushed filter {fragment!r} missing:\n{plan[:2000]}"


# (query, columns that must NOT be read) — column pruning: a scan reading
# the fat text/embedding column for a metadata-only query is a regression.
PRUNING = [
    ("sort_topn_lineitems", "l_comment"),
    ("sample_seeded", "props"),
    ("argmin_supplier_per_nation", "s_comment"),
    # kmeans must scan ONLY the embedding column (r08 one-pass rework)
    ("kmeans_cluster_stats", "text"),
    ("chunk_sliding_windows", "source"),
    # session-2: the sketch paths must scan only what they use (the
    # checkpoint/driver-state queries — acf, trend, pca twins — hide
    # their parquet scan inside the materialization job, so the final
    # executed plan has no ReadSchema to assert on)
    ("kmv_distinct_users", "props"),
    ("tokenizer_fertility_by_lang", "source"),
]


@pytest.mark.parametrize("name,absent_col", PRUNING)
def test_column_pruning(spark, name, absent_col):
    plan = _executed_plan(spark, name)
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, f"{name}: no ReadSchema found"
    for ln in scan_lines:
        assert absent_col not in ln, f"{name}: scan reads pruned column {absent_col}:\n{ln}"


# dimension joins that must stay broadcast (no sort-merge shuffle of a
# small side at any SF — nation/region/customer are bounded)
BROADCAST = [
    ("join_revenue_by_nation", "BroadcastHashJoin"),
    ("shipping_priority_topk", "BroadcastHashJoin"),
    ("interleave_sources_order", "BroadcastHashJoin"),
    # the m-row quota table must broadcast onto the ranked doc frame
    ("temperature_quota_sample", "BroadcastHashJoin"),
    # the 7-row lag table must broadcast onto the daily series, and the
    # k-row BT scale table onto the per-item frame
    ("acf_daily_revenue", "BroadcastNestedLoopJoin"),
    ("spearman_spend_vs_orders", "BroadcastHashJoin"),
]


@pytest.mark.parametrize("name,node", BROADCAST)
def test_small_side_broadcasts(spark, name, node):
    plan = _executed_plan(spark, name)
    assert node in plan, f"{name}: expected {node} in plan:\n{plan[:2000]}"


# Every bench.py HEADLINE query must have a section in docs/PLANS.md — the
# audit doc drifted twice (r07 NAMES miss, r08 anova/benford lag).  The
# gen_plans NAMES list now unions HEADLINE mechanically; this test fences
# the committed artifact itself so the regeneration can't be forgotten.
def test_plans_md_covers_headline():
    import re
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import HEADLINE

    plans = open(os.path.join(repo, "docs", "PLANS.md"), encoding="utf-8").read()
    sections = set(re.findall(r"^## (\S+)$", plans, re.MULTILINE))
    missing = [n for n in HEADLINE if n not in sections]
    assert not missing, (
        f"docs/PLANS.md lacks sections for {len(missing)} HEADLINE queries "
        f"(regenerate with python docs/gen_plans.py): {missing}"
    )


# BENCH_FLOORS.json must cover every HEADLINE query — a query without a
# committed floor silently opts out of bench.py's >2x-floor auto-rerun,
# which is the r09 contention-hardening contract.
def test_bench_floors_cover_headline():
    import json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from bench import HEADLINE

    floors = json.load(open(os.path.join(repo, "BENCH_FLOORS.json")))["floors"]
    missing = [n for n in HEADLINE if n not in floors]
    assert not missing, (
        f"BENCH_FLOORS.json lacks floors for {len(missing)} HEADLINE queries "
        f"(fold in isolated readings via tools/gen_floors.py): {missing}"
    )
    assert all(v > 0 for v in floors.values())
