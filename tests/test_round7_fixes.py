"""Round-7 fixes: branch NULL routing, firstOnly guards, BPE collision
guard, lazy interleave_sources plan construction."""

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.pipeline import (
    PipelineSpecError,
    branch_by_schema,
    compile_pipeline,
)


# ---------------------------------------------------------------- branch NULL
def test_branch_null_predicate_rows_reach_otherwise(spark):
    """A row whose discriminator is NULL/malformed must land in `otherwise`
    (the quarantine branch exists for exactly those records), not vanish.

    Mirrors tryRules' pred.isNull() handling (filters.py) — the reference's
    per-record dispatch never loses a record either (a record that matches
    no rule falls through, MorphlineTransform.java:113-123)."""
    df = spark.createDataFrame(
        [('{"type": "a", "v": 1}',), ('{"type": "b", "v": 2}',), ("not json at all",), (None,)],
        "_value string",
    )
    t = F.get_json_object("_value", "$.type")
    out = branch_by_schema(
        df,
        [(t == "a", lambda d: d.withColumn("route", F.lit("a"))),
         (t == "b", lambda d: d.withColumn("route", F.lit("b")))],
        otherwise=lambda d: d.withColumn("route", F.lit("dlq")),
    )
    routes = sorted(r["route"] for r in out.collect())
    assert routes == ["a", "b", "dlq", "dlq"], "no row may be dropped by routing"


def test_route_by_schema_command_quarantines_malformed(spark):
    spec = {
        "commands": [
            {"routeBySchema": {
                "branches": [
                    {"when": "get_json_object(_value, '$.type') = 'a'",
                     "commands": [{"setValues": {"route": "a"}}]},
                ],
                "otherwise": [{"setValues": {"route": "dlq"}}],
            }},
        ]
    }
    df = spark.createDataFrame([('{"type": "a"}',), ("garbage",)], "_value string")
    out = compile_pipeline(spec)(df)
    got = sorted(r["route"] for r in out.collect())
    assert got == ["a", "dlq"]


# ---------------------------------------------------------------- firstOnly
def test_first_only_rejects_streaming_input(spark):
    pipe = compile_pipeline(
        {"settings": {"firstOnly": True},
         "commands": [{"setValues": {"x": 1}}]}
    )
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    with pytest.raises(PipelineSpecError, match="batch-only"):
        pipe(stream)


def test_first_only_rejects_wide_commands(spark):
    pipe = compile_pipeline(
        {"settings": {"firstOnly": True},
         "commands": [{"head": {"limit": 5}}]}
    )
    df = spark.createDataFrame([(1,), (2,)], "x int")
    with pytest.raises(PipelineSpecError, match="narrow"):
        pipe(df)


def test_wide_commands_fine_without_first_only(spark):
    pipe = compile_pipeline({"commands": [{"head": {"limit": 1}}]})
    df = spark.createDataFrame([(1,), (2,)], "x int")
    assert pipe(df).count() == 1


# ------------------------------------------------------------- BPE collision
def _ref_bpe(texts, n_merges, end="</w>"):
    from collections import Counter

    freqs = Counter()
    for t in texts:
        for w in t.split():
            freqs[w] += 1
    words = {w: list(w) + [end] for w in freqs}
    rules = []
    for rank in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        rules.append((rank, left, right, cnt))
        m = left + right
        for w, syms in words.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(m)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            words[w] = res
    return rules


def test_bpe_batched_matches_sequential_on_collision_prone_corpus(spark):
    """Corpus engineered so two merge paths produce the same string
    ('a'+'bc' and 'ab'+'c' -> 'abc') with closely-ranked counts: the
    batched acceptance guard must end the batch at the collision instead
    of letting stacked created-pair counts break the max-bound."""
    from kafka_connect_morphlines_spark.functions import traindata

    texts = (
        ["abc"] * 30            # both (a,b) and (b,c) pairs, then abc paths
        + ["ab"] * 24           # boosts (a,b)
        + ["bc"] * 23           # boosts (b,c) to nearly the same count
        + ["abcabc"] * 9        # internal (c,a) adjacency -> chained pairs
        + ["xabc yabc zabc"] * 5
        + ["abcx abcy"] * 4
    )
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in traindata.bpe_train(df, n_merges=16).orderBy("rank").collect()
    ]
    want = _ref_bpe(texts, 16)
    assert got == want


# ------------------------------------------------------------ lazy interleave
def test_interleave_sources_builds_plan_without_running_a_job(spark):
    """Pipeline compilation must be action-free: building the interleave
    plan runs zero Spark jobs (the m-row count is folded into the plan as
    a window, not collected eagerly)."""
    from kafka_connect_morphlines_spark.functions import traindata

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, source string"
    )
    df.count()  # materialize the input before arming the spy
    sc = spark.sparkContext
    group = "interleave-lazy-spy"
    sc.setJobGroup(group, "plan-build spy", interruptOnCancel=False)
    try:
        out = traindata.interleave_sources(df)  # must not run a job
        jobs_during_build = list(sc.statusTracker().getJobIdsForGroup(group))
    finally:
        sc.setJobGroup("", "")
    assert jobs_during_build == [], f"plan build ran Spark jobs: {jobs_during_build}"

    rows = out.orderBy("pos").collect()
    # positions cycle the 3 sources round-robin
    assert [r["source"] for r in rows[:6]] == ["s0", "s1", "s2", "s0", "s1", "s2"]
    assert len({r["pos"] for r in rows}) == len(rows)


# ----------------------------------------------------------- multiValued mode
def test_multivalued_pipeline_reference_multimap_semantics(spark):
    """Golden for the ordered-multimap compat layer (multiValued: true):
    mirrors a reference pipeline over a String->List record
    (MorphlineTransform.java:137-148 — put appends, removeValues filters
    ALL matching occurrences keeping order/duplicates, replaceValues
    swaps the whole list)."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    spec = {
        "commands": [
            {"setValues": {"multiValued": True, "tags": ["a", "b"]}},
            {"addValues": {"tags": ["c", "a", "b"]}},          # append -> [a,b,c,a,b]
            {"removeValues": {"multiValued": True, "tags": "a"}},  # -> [b,c,b]
            {"replaceValues": {"multiValued": True, "final": "@{topic}"}},
        ]
    }
    df = spark.createDataFrame([("t1",)], "topic string")
    row = compile_pipeline(spec)(df).collect()[0]
    assert row["tags"] == ["b", "c", "b"], "order AND duplicates must survive removal"
    assert row["final"] == ["t1"], "replaceValues replaces the whole list (as a list)"


def test_multivalued_scalar_lift_on_remove(spark):
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    df = spark.createDataFrame([("x",), ("y",)], "v string")
    out = compile_pipeline([{"removeValues": {"multiValued": True, "v": "x"}}])(df)
    got = {tuple(r["v"]) for r in out.collect()}
    assert got == {(), ("y",)}, "matched scalar -> empty list; survivor -> one-element list"


def test_default_remains_scalar_without_multivalued(spark):
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    df = spark.createDataFrame([("x",)], "v string")
    out = compile_pipeline([{"setValues": {"w": "@{v}"}}])(df)
    row = out.collect()[0]
    assert row["w"] == "x"  # scalar, not a 1-element list


# ------------------------------------------------------- Pillow-gated decode
@pytest.mark.pillow
def test_real_image_decode_with_pillow(spark):
    """Where Pillow exists, _decode_image really decodes: a generated 8x1
    grayscale PNG must come back as its exact pixel values (p/255), not
    the digest fake.  Auto-skips in codec-less sandboxes (the stub path
    keeps its deterministic golden there)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image
    from pyspark.sql import functions as F

    from kafka_connect_morphlines_spark.functions.multimodal import extract_features

    pixels = [0, 32, 64, 96, 128, 160, 192, 255]
    img = Image.new("L", (8, 1))
    img.putdata(pixels)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    payload = buf.getvalue()

    df = spark.createDataFrame(
        [(1, "image/png", payload)], "media_id long, mime string, payload binary"
    )
    row = extract_features(df).collect()[0]
    assert row["feature"] == pytest.approx([p / 255.0 for p in pixels], abs=1e-6)


def test_stub_decode_is_digest_fake_without_pillow(spark):
    """The inverse gate: without Pillow (this sandbox), non-decodable bytes
    yield the sha256-derived deterministic fake the goldens pin."""
    import hashlib

    from kafka_connect_morphlines_spark.functions import multimodal

    if multimodal._HAVE_PIL:
        pytest.skip("Pillow present; the fake path is exercised via non-image bytes elsewhere")
    payload = b"not an image"
    row = (
        multimodal.extract_features(
            spark.createDataFrame([(1, "image/x", payload)], "media_id long, mime string, payload binary")
        )
        .collect()[0]
    )
    want = [b / 255.0 for b in hashlib.sha256(payload).digest()[:8]]
    assert row["feature"] == pytest.approx(want, abs=1e-6)


# ------------------------------------------------------- CSV metrics reporter
def test_metrics_csv_reporter_batch(spark, tmp_path):
    """startReportingMetricsToCSV + observe: after the caller's action,
    flush_metrics appends one Codahale-CSV-style file per metric (the
    per-action batch analog of the reference's reporter thread)."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    out = str(tmp_path / "metrics")
    pipe = compile_pipeline(
        [
            {"startReportingMetricsToCSV": {"outputDir": out}},
            {"observe": {"name": "ingested"}},
            {"contains": {"event_type": ["click"]}},
            {"observe": {"name": "kept"}},
        ]
    )
    df = spark.createDataFrame([("click",), ("view",), ("click",)], "event_type string")
    result = pipe(df)
    assert result.count() == 2  # the action the observations resolve on
    paths = pipe.flush_metrics()
    assert sorted(p.rsplit("/", 1)[1] for p in paths) == ["ingested.csv", "kept.csv"]
    import csv

    with open(f"{out}/ingested.csv") as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["ts", "morphline_id", "metric", "key", "value"]
    assert rows[1][2:] == ["ingested", "numRecords", "3"]
    with open(f"{out}/kept.csv") as fh:
        assert list(csv.reader(fh))[1][2:] == ["kept", "numRecords", "2"]
    # flush is drain-once; a second flush with no new action writes nothing
    assert pipe.flush_metrics() == []


def test_metrics_csv_reporter_streaming_micro_batches(spark, tmp_path):
    """Same pipeline through the streaming runner: inside foreachBatch the
    frame is a batch frame, so each micro-batch appends its own rows."""
    import csv
    import glob
    import time

    from kafka_connect_morphlines_spark.pipeline import compile_pipeline
    from kafka_connect_morphlines_spark.streaming import runner

    out = str(tmp_path / "metrics")
    pipe = compile_pipeline(
        [
            {"startReportingMetricsToCSV": {"outputDir": out}},
            {"observe": {"name": "stream_rows"}},
        ]
    )
    src = spark.readStream.format("rate").option("rowsPerSecond", 50).load()
    sunk = []
    q = runner.run_stream(
        src, pipe, sink=lambda df, epoch: sunk.append(df.count()),
        checkpoint=str(tmp_path / "ckpt"), query_name="metrics_smoke",
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            files = glob.glob(f"{out}/stream_rows.csv")
            if files and len(list(csv.reader(open(files[0])))) >= 3:  # header + >=2 batches
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = list(csv.reader(open(f"{out}/stream_rows.csv")))
    assert rows[0] == ["ts", "morphline_id", "metric", "key", "value"]
    assert len(rows) >= 3 and all(r[2] == "stream_rows" for r in rows[1:])


# ---------------------------------------------------- temperature quota sample
def test_temperature_quota_sums_to_k_and_upweights_small_sources(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    rows = [(i, "big") for i in range(900)] + [(i + 1000, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = traindata.temperature_quota_sample(df, k_total=100).collect()
    assert len(out) == 100, "exact-k contract"
    by_src = {}
    for r in out:
        by_src[r["source"]] = by_src.get(r["source"], 0) + 1
    # sqrt temperature: big/small = sqrt(900)/sqrt(100) = 3:1 (proportional
    # sampling would give 9:1) -> small source upweighted to ~25 slots
    assert by_src["small"] == 25 and by_src["big"] == 75, by_src

    # determinism: rerun yields the identical id set
    ids1 = sorted(r["doc_id"] for r in out)
    ids2 = sorted(r["doc_id"] for r in traindata.temperature_quota_sample(df, k_total=100).collect())
    assert ids1 == ids2
