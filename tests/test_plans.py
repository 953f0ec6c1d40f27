"""Plan-shape regression tests: the 100 TB contract, checked on the
physical plan rather than timed.

Correctness tests prove a query returns the right rows at sf0.01; these
prove the *plan* is the one that survives a 1000-executor scale-up:
predicates reach the parquet scan, projections prune the read schema,
small dims broadcast instead of shuffling the fact, aggregates combine
map-side, top-k never global-sorts, and the hot path stays inside
whole-stage codegen with zero Python row evaluation (SURVEY.md §4's
"emit Column expressions, never opaque UDFs" stance).
"""

from __future__ import annotations

import contextlib
import io

import pytest

from kafka_connect_morphlines_spark.plans.queries import QUERIES

from tests.conftest import SF_DIR


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def build(spark, name: str):
    return QUERIES[name].build(spark, SF_DIR)


def test_filter_agg_pushes_all_predicates_to_scan(spark):
    """Q6 shape: every fact-local predicate must appear in PushedFilters —
    at 100 TB these prune row groups before any Spark code runs."""
    plan = plan_of(build(spark, "filter_agg_revenue"))
    assert "PushedFilters:" in plan
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert any(
            f"{pred}({col}" in plan for pred in ("GreaterThan", "LessThan", "GreaterThanOrEqual", "LessThanOrEqual")
        ), f"predicate on {col} not pushed:\n{plan}"


def test_filter_agg_prunes_read_schema(spark):
    """The Q6 scan must read 5 columns, not all 11 of lineitem."""
    plan = plan_of(build(spark, "filter_agg_revenue"))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" in scan and "l_discount" in scan
    for unused in ("l_orderkey", "l_partkey", "l_returnflag", "l_tax"):
        assert unused not in scan, f"unpruned column {unused}: {scan}"


def test_projection_pipeline_prunes_scan(spark):
    """removeFields compiles to a projection Catalyst pushes into the scan:
    dropping columns in the pipeline must shrink the parquet read itself."""
    plan = plan_of(build(spark, "remove_fields_projection"))
    scan = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "doc_id" in scan and "lang" in scan
    assert "text" not in scan, f"dropped column still read: {scan}"


def test_dim_joins_broadcast_not_shuffle(spark):
    """Star joins against nation/customer dims must be broadcast hash joins;
    a shuffle join on the fact table is the classic 100 TB regression."""
    for name in ("join_revenue_by_nation", "shipping_priority_topk", "volume_shipping_pairs"):
        plan = plan_of(build(spark, name))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast:\n{plan}"


def test_wide_tpch_shapes_broadcast_with_no_sort_merge(spark):
    """The Q5/Q8/Q15/Q16/Q17 shapes: every dim/aggregate-side join must
    broadcast and nothing may degrade to a sort-merge join or a real
    cartesian product — on the 100 TB fact table those are the plans that
    die first."""
    for name in (
        "local_supplier_volume",
        "nation_market_share",
        "top_revenue_supplier",
        "supplier_part_variety",
        "small_quantity_revenue",
    ):
        plan = plan_of(build(spark, name))
        assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast:\n{plan}"
        assert "SortMergeJoin" not in plan, f"{name} degraded to sort-merge:\n{plan}"
        assert "CartesianProduct" not in plan, f"{name} planned a cartesian:\n{plan}"


def test_topk_uses_take_ordered_not_global_sort(spark):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    heap + driver merge), never a full Exchange rangepartitioning sort."""
    plan = plan_of(build(spark, "shipping_priority_topk"), mode="simple")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()


def test_aggregates_have_map_side_partial(spark):
    """groupBy must plan partial_ aggregates before the exchange so the
    shuffle carries one row per key per partition, not the raw fact."""
    plan = plan_of(build(spark, "agg_pricing_summary"), mode="simple")
    assert "partial_" in plan, plan


def test_cube_plans_expand_single_shuffle(spark):
    """CUBE = Expand operator + ONE aggregate exchange, not one job per
    grouping set."""
    plan = plan_of(build(spark, "cube_order_counts"), mode="simple")
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_hot_queries_have_no_python_row_path(spark):
    """The morphline-parity and text/dedup hot paths must stay JVM-side:
    no BatchEvalPython / PythonUDF / mapInPandas in the plan.  (The only
    sanctioned Python stages are the `java`-command escape hatch and the
    multimodal decode stub, exercised elsewhere.)"""
    hot = [
        "read_json_typed",
        "grok_extract",
        "convert_timestamp_millis",
        "set_values_template",
        "text_quality",
        "pii_redact",
        "html_strip",
        "dup_ngram_stats",
        "word_entropy",
        "doc_fingerprint",
        "dedup_exact",
        "lang_id_pred",
        "token_frequencies",
        "embedding_cosine_topk",
        "asof_join_events",
    ]
    for name in hot:
        plan = plan_of(build(spark, name), mode="simple")
        for marker in ("BatchEvalPython", "PythonUDF", "MapInPandas", "FlatMapGroupsInPandas"):
            assert marker not in plan, f"{name} fell off codegen into {marker}:\n{plan}"


def test_hot_queries_whole_stage_codegen(spark):
    """Scalar morphline commands must compile into whole-stage codegen
    spans (fused JVM loops), not interpreted expression evaluation."""
    for name in ("set_values_template", "find_replace", "split_field", "math_functions"):
        plan = plan_of(build(spark, name), mode="simple")
        assert "*(" in plan, f"{name} has no codegen stage:\n{plan}"


def test_exists_semi_join_does_not_materialize_right(spark):
    """EXISTS compiles to a semi join (probe-only), never inner + distinct."""
    plan = plan_of(build(spark, "exists_orders_by_priority"), mode="simple")
    assert "LeftSemi" in plan, plan


def test_anti_join_shape(spark):
    """NOT EXISTS compiles to an anti join."""
    plan = plan_of(build(spark, "idle_rich_customers"), mode="simple")
    assert "LeftAnti" in plan, plan


def test_group_having_aggregates_before_join(spark):
    """Q18 shape: the HAVING aggregate must sit below the orders join in
    the plan (shrink-then-join), not after it."""
    plan = plan_of(build(spark, "large_order_customers"), mode="simple")
    first_join = plan.index("Join")
    assert "partial_sum" in plan[first_join:], "aggregate did not stay below the join"


def test_minhash_shuffle_carries_signatures_not_docs(spark):
    """MinHash LSH: the groupBy shuffle key is the doc id and the payload
    the 64 partial mins — the plan must show partial_min aggregates (map-side
    combine) so shingle rows never cross the wire.  (Asserted on the
    signature stage directly: the end-to-end query materializes it behind a
    checkpoint, which hides the aggregate from the final explain.)"""
    from kafka_connect_morphlines_spark.functions import dedup
    from kafka_connect_morphlines_spark.sources.files import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = plan_of(dedup.minhash_signatures(docs), mode="simple")
    assert "partial_min" in plan, plan


@pytest.mark.parametrize("name", ["filter_agg_revenue", "orders_by_month"])
def test_aqe_enabled_on_corpus_plans(spark, name):
    """AQE must stay on (runtime re-plan: skew joins, coalesced shuffle
    partitions) — the session default the whole corpus relies on."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    plan = plan_of(build(spark, name), mode="simple")
    assert "AdaptiveSparkPlan" in plan


def test_bucketed_join_plans_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with ZERO Exchange operators — the co-located fact-fact join that
    replaces the dominant shuffle at 100 TB."""
    from kafka_connect_morphlines_spark.functions.bucketing import bucketed, write_bucketed
    from kafka_connect_morphlines_spark.sources.files import load_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path}/bktest.db'")
    prev_threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        write_bucketed(
            load_table(spark, SF_DIR, "orders"), "bktest.orders_b", "o_orderkey", 4, sort_cols="o_orderkey"
        )
        write_bucketed(
            load_table(spark, SF_DIR, "lineitem"), "bktest.lineitem_b", "l_orderkey", 4, sort_cols="l_orderkey"
        )
        # force the shuffle-join path (broadcast would mask the layout win)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed(spark, "bktest.lineitem_b").join(
            bucketed(spark, "bktest.orders_b"),
            on=spark.table("bktest.lineitem_b").l_orderkey == spark.table("bktest.orders_b").o_orderkey,
        )
        plan = plan_of(j, mode="simple")
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        # and an aggregation on the bucket key is exchange-free too
        agg = bucketed(spark, "bktest.lineitem_b").groupBy("l_orderkey").count()
        agg_plan = plan_of(agg, mode="simple")
        assert "Exchange" not in agg_plan, f"bucketed agg still shuffles:\n{agg_plan}"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_threshold)
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_read_json_parses_once_per_row(spark):
    """readJson typed mode must evaluate from_json exactly once per row:
    predicate pushdown re-inlines project aliases into filters (3 parses
    per row before the Generate fence), and JSON parsing dominates this
    pipeline at scale."""
    plan = plan_of(build(spark, "read_json_typed"), mode="simple")
    assert plan.count("from_json") == 1, plan


def test_decontaminate_broadcasts_benchmark(spark):
    """Decontamination must broadcast the benchmark gram set — the corpus
    side is the 100 TB side and must never shuffle its text; the only
    exchanges allowed are the per-doc distinct/agg keyed on (id, gram)."""
    plan = plan_of(build(spark, "decontaminate_ngrams"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, f"benchmark join fell back to shuffle:\n{plan}"


def test_pack_sequences_window_is_partitioned(spark):
    """Packing uses exactly one window, partitioned by the packing group —
    a global (unpartitioned) window is the single-node trap."""
    df = build(spark, "pack_sequences_bins")
    plan = plan_of(df)
    assert "Window" in plan
    # the window's Exchange must be hashpartitioning on the group key, not a
    # SinglePartition gather
    assert "hashpartitioning(source" in plan, f"window not partitioned by group:\n{plan}"
    assert "SinglePartition" not in plan


def test_waiting_suppliers_broadcasts_supplier(spark):
    """Q21 shape: supplier dim broadcasts; only the big-big join between
    lineitem-late rows and the per-order aggregate may sort-merge."""
    plan = plan_of(build(spark, "waiting_suppliers"), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") <= 1, f"extra shuffle joins:\n{plan}"


def test_mixture_sample_is_map_side_only(spark):
    """Mixture sampling is a pure scan-side filter: zero exchanges."""
    plan = plan_of(build(spark, "mixture_sample_deterministic"))
    assert "Exchange" not in plan, f"sampling introduced a shuffle:\n{plan}"


def test_hash_split_is_map_side_only(spark):
    plan = plan_of(build(spark, "hash_split_assign"))
    assert "Exchange" not in plan, f"split introduced a shuffle:\n{plan}"


def test_global_shuffle_window_is_shard_partitioned(spark):
    """The epoch-shuffle ranking must window per shard — a global row_number
    would funnel the corpus through one partition."""
    plan = plan_of(build(spark, "global_shuffle_order"))
    assert "Window" in plan
    assert "hashpartitioning(shard" in plan, f"window not partitioned by shard:\n{plan}"
    assert "SinglePartition" not in plan


def test_dominant_part_suppliers_broadcasts_dims(spark):
    """Q20 shape: part and supplier broadcast; lineitem never shuffles raw —
    the only exchanges key the aggregated (part, supp) frame."""
    plan = plan_of(build(spark, "dominant_part_suppliers"), mode="simple")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan, f"dim join fell back to shuffle:\n{plan}"


def test_encode_documents_broadcasts_vocab(spark):
    """The encode join must broadcast the (bounded) vocab; the corpus-side
    token stream only shuffles for the per-document re-assembly."""
    plan = plan_of(build(spark, "encode_documents_ids"), mode="simple")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, f"vocab join fell back to shuffle:\n{plan}"


def test_jaccard_joins_on_token_not_block(spark):
    """ngram_jaccard_pairs must key its self-join on (block, token-hash), not
    the block key alone — one distinct value per block means one straggler
    task per block at corpus scale.  The intersection must be an aggregate
    (map-side combinable), never a per-pair array_intersect."""
    plan = plan_of(build(spark, "ngram_jaccard_pairs"), mode="extended")
    assert "array_intersect" not in plan, f"per-pair set intersect back in the plan:\n{plan}"
    # hashed tokens in the join key.  Since the r10 posting-frame
    # materialization the tokenize+xxhash64 chain runs once into a
    # checkpoint, so the final plan joins two ExistingRDD scans — the
    # invariant is now that the self-join's equi-keys carry the token-hash
    # column (_h) next to the block, never the block alone.
    import re

    key_pairs = re.findall(r"\[_blk#\d+L?, _h#\d+L?\]", plan)
    assert len(key_pairs) >= 2, f"self-join not keyed on (block, token-hash):\n{plan}"


def test_simhash_votes_are_aggregates_not_folds(spark):
    """SimHash bit votes must be codegen conditional-sum aggregates over
    exploded token hashes; interpreted per-element `aggregate` folds are
    O(bits x tokens) per row."""
    plan = plan_of(build(spark, "dedup_simhash"), mode="extended")
    assert "aggregate(" not in plan, f"interpreted higher-order fold in simhash plan:\n{plan}"
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_unigram_logprob_text_never_shuffles(spark):
    """The LM scoring join keys on tokens; document text stays in the scan
    projection and never enters an exchange."""
    plan = plan_of(build(spark, "unigram_logprob"))
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln or "Arguments: hashpartitioning" in ln]
    assert "text" not in " ".join(exchanges), f"document text in a shuffle:\n{plan}"


def test_runtime_bloom_filter_injects_on_selective_join(spark):
    """Spark's InjectRuntimeFilter must add a bloom-filter semi-join
    reduction to the fact side of a shuffle join whose build side is
    selectively filtered: the fact scan then drops non-joining rows before
    the shuffle.  At real scale this fires out of the box (the application
    side must exceed spark.sql.optimizer.runtime.bloomFilter.
    applicationSideScanSizeThreshold, default 10 GB); the test lowers the
    threshold because sf0.01 is far below it."""
    from pyspark.sql import functions as F

    from kafka_connect_morphlines_spark.sources.files import load_table

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_thr = spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
        li = load_table(spark, SF_DIR, "lineitem")
        orders = load_table(spark, SF_DIR, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", prev_thr)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A fact table written partitionBy(key) joined to a filtered dim must
    plan with a dynamicpruning subquery on the fact's PartitionFilters —
    at 100 TB this skips whole partition directories of the fact scan based
    on the dim filter, before any data is read."""
    from pyspark.sql import functions as F

    from kafka_connect_morphlines_spark.sources.files import load_table

    out = str(tmp_path / "ev_part")
    load_table(spark, SF_DIR, "events").write.partitionBy("event_type").mode("overwrite").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame([("click", 1), ("error", 2)], "event_type string, w int").filter(
        F.col("w") == 1
    )
    plan = fact.join(dim, "event_type")._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan


def test_parquet_aggregate_pushdown_metadata_only(spark, tmp_path):
    """count/min/max over parquet resolve from footer statistics when
    aggregate pushdown is on — a full-table count at 100 TB becomes a
    metadata read, no data pages touched."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "agg_push")
    spark.range(100_000).select("id", (F.col("id") % 7).alias("k")).write.parquet(path)
    # pushdown lives in the DataSource V2 scan builder; the v1 path ignores it
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try:
        df = spark.read.parquet(path).agg(
            F.count(F.lit(1)).alias("n"), F.min("id").alias("lo"), F.max("id").alias("hi")
        )
        plan = plan_of(df)
        assert "PushedAggregation: [COUNT(*), MIN(id), MAX(id)]" in plan, plan
        row = df.collect()[0]
        assert (row["n"], row["lo"], row["hi"]) == (100_000, 0, 99_999)
    finally:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
        spark.conf.unset("spark.sql.sources.useV1SourceList")


def test_register_views_sql_surface(spark):
    from kafka_connect_morphlines_spark.sources.files import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "documents" in names
    got = spark.sql(
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1 ORDER BY 1"
    ).collect()
    assert len(got) == 3 and sum(r["n"] for r in got) > 0
    # NTZ fix-up reaches SQL users: events.ts must be instant-typed
    t = dict(spark.sql("SELECT * FROM events").dtypes)["ts"]
    assert t == "timestamp"
