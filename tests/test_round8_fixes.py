"""Round-8 regression tests (VERDICT.md r07 + driver ADVICE items).

Covers: the PipelineMetrics.flush deadlock (flush before any action, or
with a never-acted-on second pipeline application, must not block),
temperature_quota_sample quota overflow on small sources, the
multiValued reserved-key namespacing, and citation integrity for every
/root/reference path mentioned in package docstrings.
"""

from __future__ import annotations

import os
import re

import pytest

PKG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "kafka_connect_morphlines_spark")


# ------------------------------------------------------ metrics flush deadlock
def test_flush_before_action_is_noop_not_deadlock(spark, tmp_path):
    """ADVICE r07 (medium): Observation.get blocks until the observed frame
    runs an action; flushing before the action used to hang forever.  Now a
    pre-action flush returns [] and leaves the observation pending, and the
    post-action flush drains it."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    out = str(tmp_path / "metrics")
    pipe = compile_pipeline(
        [
            {"startReportingMetricsToCSV": {"outputDir": out}},
            {"observe": {"name": "pending_metric"}},
        ]
    )
    df = spark.createDataFrame([("a",), ("b",)], "v string")
    result = pipe(df)
    # No action has run yet — this call used to deadlock on obs.get.
    assert pipe.flush_metrics() == []
    assert len(pipe.metrics.pending) == 1  # still pending, not dropped
    assert result.count() == 2
    paths = pipe.flush_metrics()
    assert [p.rsplit("/", 1)[1] for p in paths] == ["pending_metric.csv"]
    assert pipe.metrics.pending == []


def test_flush_drains_only_resolved_observations(spark, tmp_path):
    """A pipeline applied twice with only one action: the acted-on
    observation drains; the never-acted one stays pending instead of
    hanging the flush (the foreachBatch-thread scenario from ADVICE)."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    out = str(tmp_path / "metrics")
    pipe = compile_pipeline(
        [
            {"startReportingMetricsToCSV": {"outputDir": out}},
            {"observe": {"name": "dual_metric"}},
        ]
    )
    acted = pipe(spark.createDataFrame([("x",)], "v string"))
    pipe(spark.createDataFrame([("y",), ("z",)], "v string"))  # never acted on
    assert acted.count() == 1
    paths = pipe.flush_metrics()  # must not block on the un-acted observation
    assert [p.rsplit("/", 1)[1] for p in paths] == ["dual_metric.csv"]
    assert len(pipe.metrics.pending) == 1  # the un-acted one survives
    import csv

    rows = list(csv.reader(open(f"{out}/dual_metric.csv")))
    assert rows[1][2:] == ["dual_metric", "numRecords", "1"]


# ------------------------------------------- temperature quota cap (ADVICE)
def test_temperature_quota_caps_small_sources_exact_k(spark):
    """ADVICE r07: sqrt upweighting can assign a small source quota > n_s;
    the uncapped filter then silently under-filled the sample.  The r08
    water-filling apportionment caps at n_s and redistributes, keeping the
    exact-k contract."""
    from kafka_connect_morphlines_spark.functions import traindata

    rows = [(i, "big") for i in range(10000)] + [(20000 + i, "tiny") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = traindata.temperature_quota_sample(df, k_total=500).collect()
    assert len(out) == 500, "exact-k even when a cap binds"
    by = {}
    for r in out:
        by[r["source"]] = by.get(r["source"], 0) + 1
    assert by == {"big": 496, "tiny": 4}
    # k >= total rows: every source saturates, the whole table comes back
    assert traindata.temperature_quota_sample(df, k_total=99999).count() == len(rows)


def test_temperature_quota_oracle_parity_with_binding_cap(spark, tmp_path):
    """The registered DuckDB oracle must replay the cap-aware water-filling
    exactly, including on a corpus where the cap binds (the driver's sf
    corpora never trigger it, so pin it here)."""
    import duckdb

    import __spark_entry__ as e
    from kafka_connect_morphlines_spark.functions import traindata

    rows = [(i, "big") for i in range(3000)] + [(90000 + i, "tiny") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    pq = str(tmp_path / "documents.parquet")
    df.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    sql = e.oracle_sql()["temperature_quota_sample"]
    got = traindata.temperature_quota_sample(df, k_total=200, seed="tqs")
    s = sorted(
        (r["source"], r["doc_id"], r["grp_rank"], r["quota"]) for r in got.collect()
    )
    o = sorted(
        (r["source"], r["doc_id"], r["grp_rank"], r["quota"])
        for r in con.execute(sql).fetchdf().to_dict("records")
    )
    assert len(s) == 200 and s == o


# ------------------------------------------- multiValued reserved-key fix
def test_multivalued_field_name_not_swallowed(spark):
    """ADVICE r07: a kite morphline may legitimately assign a field named
    'multiValued'; the engine option must not eat it.  Non-boolean values
    are field assignments; boolean stays the option; the namespaced
    '_multiValued' alias always wins."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    df = spark.createDataFrame([("t1",)], "topic string")
    # string value -> plain field assignment, NOT the option
    out = compile_pipeline([{"setValues": {"multiValued": "yes", "x": 1}}])(df)
    row = out.collect()[0]
    assert row["multiValued"] == "yes" and row["x"] == 1

    # namespaced alias arms the option and never becomes a column
    out2 = compile_pipeline([{"setValues": {"_multiValued": True, "tags": "a"}}])(df)
    assert "_multiValued" not in out2.columns
    assert out2.collect()[0]["tags"] == ["a"]

    # bare boolean keeps the r07 behavior (option, not a field)
    out3 = compile_pipeline([{"setValues": {"multiValued": True, "tags": "a"}}])(df)
    assert "multiValued" not in out3.columns
    assert out3.collect()[0]["tags"] == ["a"]


# ----------------------------------------- multimap parity on value commands
def test_find_replace_maps_over_array_elements(spark):
    """VERDICT r07 #6: kite findReplace rewrites EACH value of a multimap
    field; an ArrayType column must map element-wise, not stringify."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    df = spark.createDataFrame([(["foo-x", "bar-x", "baz"],)], "v array<string>")
    out = compile_pipeline(
        [{"findReplace": {"field": "v", "find": "-x", "replace": "!"}}]
    )(df)
    assert out.collect()[0]["v"] == ["foo!", "bar!", "baz"]
    # replaceFirst leg, element-wise
    out2 = compile_pipeline(
        [{"findReplace": {"field": "v", "find": "a", "replace": "_", "replaceFirst": True}}]
    )(df)
    assert out2.collect()[0]["v"] == ["foo-x", "b_r-x", "b_z"]


def test_split_flattens_array_input_and_fences_output_fields(spark):
    from kafka_connect_morphlines_spark.pipeline import PipelineSpecError, compile_pipeline

    df = spark.createDataFrame([(["a,b", "c,d"],)], "v array<string>")
    out = compile_pipeline([{"split": {"inputField": "v", "separator": ","}}])(df)
    assert out.collect()[0]["v"] == ["a", "b", "c", "d"]
    with pytest.raises(PipelineSpecError, match="multi-valued"):
        compile_pipeline(
            [{"split": {"inputField": "v", "separator": ",", "outputFields": ["p", "q"]}}]
        )(df).collect()


def test_extract_json_paths_fences_array_input(spark):
    from kafka_connect_morphlines_spark.pipeline import PipelineSpecError, compile_pipeline

    df = spark.createDataFrame([(['{"a":1}', '{"a":2}'],)], "j array<string>")
    with pytest.raises(PipelineSpecError, match="multi-valued"):
        compile_pipeline(
            [{"extractJsonPaths": {"inputField": "j", "paths": {"a": "/a"}}}]
        )(df).collect()


# ------------------------------------------------------- SLF4J reporter
def test_metrics_slf4j_reporter_logs_gauge_lines(spark, caplog):
    """startReportingMetricsToSLF4J (VERDICT r07 #7): flush logs one
    Codahale-Slf4jReporter-style line per (metric, key); composes with the
    CSV reporter on the same flush."""
    import logging

    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    pipe = compile_pipeline(
        [
            {"startReportingMetricsToSLF4J": {"logger": "morphline.metrics"}},
            {"observe": {"name": "seen"}},
        ],
        morphline_id="m1",
    )
    df = spark.createDataFrame([("a",), ("b",), ("c",)], "v string")
    out = pipe(df)
    assert out.count() == 3
    with caplog.at_level(logging.INFO, logger="morphline.metrics"):
        paths = pipe.flush_metrics()
    assert paths == []  # no CSV armed
    lines = [r.getMessage() for r in caplog.records if r.name == "morphline.metrics"]
    assert lines == ["type=GAUGE, name=m1.seen.numRecords, value=3"]


def test_metrics_slf4j_and_csv_compose(spark, tmp_path, caplog):
    import logging

    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    out_dir = str(tmp_path / "m")
    pipe = compile_pipeline(
        [
            {"startReportingMetricsToSLF4J": {"logger": "mm"}},
            {"startReportingMetricsToCSV": {"outputDir": out_dir}},
            {"observe": {"name": "both"}},
        ]
    )
    res = pipe(spark.createDataFrame([(1,), (2,)], "x int"))
    assert res.count() == 2
    with caplog.at_level(logging.INFO, logger="mm"):
        paths = pipe.flush_metrics()
    assert [p.rsplit("/", 1)[1] for p in paths] == ["both.csv"]
    assert any("name=both.numRecords, value=2" in r.getMessage() for r in caplog.records)


# ---------------------------------------------- CDC chunking (new r08 op)
def test_cdc_chunks_resync_after_insertion(spark):
    """The content-defined property: prepending tokens shifts only the
    chunks near the edit — after the first content boundary the chunk
    hashes realign (fixed-width chunking would reframe everything)."""
    from kafka_connect_morphlines_spark.functions import dedup

    base = " ".join(f"tok{(i * 37) % 101}x{i % 13}" for i in range(400))
    edited = "zzz qqq " + base
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    out = dedup.cdc_chunks(df, divisor=16).collect()
    h1 = [r["chunk_hash"] for r in sorted(out, key=lambda r: r["chunk_id"]) if r["doc_id"] == 1]
    h2 = [r["chunk_hash"] for r in sorted(out, key=lambda r: r["chunk_id"]) if r["doc_id"] == 2]
    shared = set(h1) & set(h2)
    # all but the first boundary-straddling chunk(s) must realign
    assert len(shared) >= len(h1) - 2 and len(h1) > 5
    # token conservation: chunks partition the token stream
    n1 = sum(r["n_tokens"] for r in out if r["doc_id"] == 1)
    assert n1 == 400


def test_cdc_chunks_empty_and_boundary_edges(spark):
    from kafka_connect_morphlines_spark.functions import dedup

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one"), (4, "a b")],
        "doc_id long, text string",
    )
    out = dedup.cdc_chunks(df).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by and 2 not in by  # empty docs emit no chunks
    assert len(by[3]) == 1 and by[3][0]["n_tokens"] == 1


def test_source_overlap_matrix_counts(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    text_a = " ".join(f"w{i}" for i in range(20))          # grams w0..w12 starts
    text_b = " ".join(f"w{i}" for i in range(10, 30))       # overlaps w10..w19
    text_c = " ".join(f"q{i}" for i in range(20))           # disjoint
    df = spark.createDataFrame(
        [(1, "A", text_a), (2, "B", text_b), (3, "C", text_c)],
        "doc_id long, source string, text string",
    )
    rows = {(r["src_a"], r["src_b"]): r for r in traindata.source_overlap_matrix(df, n=8).collect()}
    assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = rows[("A", "B")]
    # A grams: starts 0..12 of w0..w19 -> 13; shared 8-grams: windows inside
    # w10..w19 intersect: grams starting at w10,w11,w12 in A == starts 0,1,2 in B
    assert ab["grams_a"] == 13 and ab["grams_b"] == 13 and ab["shared"] == 3
    assert rows[("A", "C")]["shared"] == 0 and rows[("A", "C")]["jaccard"] == 0.0


# --------------------------------------- sliding-window chunks (new r08 op)
def test_sliding_window_chunks_overlap_and_coverage(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        traindata.sliding_window_chunks(df, window=64, stride=32).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert [r["start_pos"] for r in rows] == [0, 32, 64, 96]
    assert [r["n_tokens"] for r in rows] == [64, 64, 36, 4]
    c0, c1 = rows[0]["chunk_text"].split(" "), rows[1]["chunk_text"].split(" ")
    assert c0[32:] == c1[:32]  # half-window overlap
    # coverage: union of chunks = the token stream
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split(" "))
    assert len(seen) == 100

    with pytest.raises(ValueError):
        traindata.sliding_window_chunks(df, window=64, stride=0)


@pytest.mark.parametrize(
    "counts,k",
    [
        ({"a": 5000, "b": 3, "c": 40}, 300),      # two caps bind in sequence
        ({"a": 1, "b": 1, "c": 1, "d": 97}, 50),  # tiny sources all saturate
        ({"a": 10, "b": 10}, 7),                  # no cap binds (plain path)
    ],
)
def test_temperature_quota_matches_python_mirror(spark, counts, k):
    """The Spark water-filling must agree with the pure-Python mirror the
    property suite exhausts (test_function_properties.test_waterfill_*)."""
    from tests.test_function_properties import _waterfill_quota
    from kafka_connect_morphlines_spark.functions import traindata

    rows, nid = [], 0
    for s, n in counts.items():
        for _ in range(n):
            rows.append((nid, s)); nid += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {}
    for r in traindata.temperature_quota_sample(df, k_total=k).collect():
        got[r["source"]] = got.get(r["source"], 0) + 1
    want = {s: q for s, q in _waterfill_quota(counts, k).items() if q > 0}
    assert got == want


# ------------------------------- kite stdlib gap-fill: detectMimeType etc.
def test_detect_mime_type_magic_bytes(spark):
    """detectMimeType (kite stdlib, importable via the org.kitesdk.**
    wildcard): deterministic magic-byte sniff incl. RIFF disambiguation."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    payloads = [
        (1, bytes.fromhex("FFD8FF") + b"rest"),
        (2, bytes.fromhex("89504E470D0A1A0A")),
        (3, b"RIFF" + b"\x00\x00\x00\x00" + b"WAVEfmt "),
        (4, b"RIFF" + b"\x00\x00\x00\x00" + b"WEBPVP8 "),
        (5, b"Obj\x01avro-container"),
        (6, b"%PDF-1.7"),
        (7, b"plain old text"),
        (8, None),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, _value binary")
    out = compile_pipeline([{"detectMimeType": {}}])(df)
    got = {r["doc_id"]: r["_attachment_mimetype"] for r in out.collect()}
    assert got == {
        1: "image/jpeg", 2: "image/png", 3: "audio/x-wav", 4: "image/webp",
        5: "avro/binary", 6: "application/pdf",
        7: "application/octet-stream", 8: None,
    }


def test_to_avro_write_byte_array_roundtrip(spark):
    """toAvro -> writeAvroToByteArray (container + containerless): the
    emitted bytes decode through the pure-Python codec to the input."""
    from kafka_connect_morphlines_spark import avro_codec
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    schema = (
        '{"type":"record","name":"E","fields":['
        '{"name":"id","type":"long"},{"name":"name","type":"string"}]}'
    )
    df = spark.createDataFrame([('{"id": 7, "name": "seven"}',)], "_value string")
    for fmt, decode in [
        ("container", lambda b: avro_codec.read_container(b)[1][0]),
        ("containerlessBinary", lambda b: avro_codec.decode_datum(
            b, {"type": "record", "name": "E", "fields": [
                {"name": "id", "type": "long"}, {"name": "name", "type": "string"}]})),
    ]:
        pipe = compile_pipeline(
            [
                {"toAvro": {"schemaString": schema}},
                {"writeAvroToByteArray": {"format": fmt}},
            ]
        )
        blob = pipe(df).collect()[0]["_value"]
        assert decode(bytes(blob)) == {"id": 7, "name": "seven"}
    # unknown format and missing schema raise clear spec errors
    from kafka_connect_morphlines_spark.pipeline import PipelineSpecError

    with pytest.raises(PipelineSpecError, match="unknown format"):
        compile_pipeline([{"writeAvroToByteArray": {"format": "nope", "schemaString": schema}}])
    with pytest.raises(PipelineSpecError, match="schemaString"):
        compile_pipeline([{"writeAvroToByteArray": {}}])


def test_read_xml_drop_invalid_and_xpath_string_leg(spark):
    from kafka_connect_morphlines_spark.pipeline import PipelineSpecError, compile_pipeline

    df = spark.createDataFrame(
        [(1, "<r><a>7</a></r>"), (2, "not xml <"), (3, None)],
        "id long, _value string",
    )
    out = compile_pipeline([{"readXml": {"schemaDdl": "a INT"}}])(df)
    rows = out.collect()
    assert [r["id"] for r in rows] == [1] and rows[0]["_xml"]["a"] == 7
    # schemaless string leg: real XPath through xpath_string
    out2 = compile_pipeline(
        [{"extractXmlPaths": {"inputField": "_value", "paths": {"a": "/r/a"}}}]
    )(df.filter("id = 1"))
    assert out2.collect()[0]["a"] == "7"
    with pytest.raises(PipelineSpecError, match="schemaDdl"):
        compile_pipeline([{"readXml": {}}])


def test_user_agent_precedence(spark):
    """Chromium UAs carry Safari+Chrome (+Edg/OPR) tokens simultaneously —
    precedence must pick the most specific; bots win over everything."""
    from kafka_connect_morphlines_spark.pipeline import compile_pipeline

    uas = [
        (1, "Mozilla/5.0 (Windows NT 10.0) Chrome/120.0 Safari/537.36 Edg/120.0.1"),
        (2, "Mozilla/5.0 (Windows NT 10.0) Chrome/119.0 Safari/537.36"),
        (3, "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) Version/17.1 Safari/605.1.15"),
        (4, "Mozilla/5.0 (compatible; bingbot/2.0; +http://www.bing.com/bingbot.htm) Chrome/100"),
        (5, None),
    ]
    df = spark.createDataFrame(uas, "id long, agent string")
    out = {r["id"]: (r["ua_family"], r["ua_major"], r["ua_os"])
           for r in compile_pipeline([{"userAgent": {"inputField": "agent"}}])(df).collect()}
    assert out[1] == ("Edge", "120", "Windows")
    assert out[2] == ("Chrome", "119", "Windows")
    assert out[3] == ("Safari", "17", "Mac OS X")
    assert out[4][0] == "Bot"
    assert out[5] == (None, None, None)


# -------------------------------------------------- citation integrity gate
def test_all_reference_citations_resolve():
    """VERDICT r07 'what's wrong' #3: a docstring cited a nonexistent
    reference file.  Every /root/reference/... path mentioned anywhere in
    the package must exist on disk, so fabricated citations are impossible."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree not mounted")
    ref_basenames = set()
    for root, _dirs, files in os.walk("/root/reference"):
        ref_basenames.update(files)
    pat = re.compile(r"/root/reference/[\w\-./]+")
    missing = []
    for root, _dirs, files in os.walk(PKG_DIR):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            text = open(path, encoding="utf-8").read()
            for m in pat.finditer(text):
                cited = m.group(0).rstrip(".")
                if "/.../" in m.group(0):
                    # `.../Foo.java` elision — the cited basename must exist
                    # somewhere under the reference tree
                    base = m.group(0).rsplit("/", 1)[1].rstrip(".")
                    if base and base not in ref_basenames:
                        missing.append(f"{path}: {m.group(0)} (basename)")
                elif not os.path.exists(cited):
                    missing.append(f"{path}: {cited}")
    assert not missing, f"citations to nonexistent reference files: {missing}"
