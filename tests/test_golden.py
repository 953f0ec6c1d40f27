"""Reference-parity golden tests.

Mirror the six end-to-end pipeline assertions in the reference's
MorphlineTransformTest.java:142-301 (noop/readjson/readavro/readline/
enrichjson/drop), with the *intended* semantics pinned (projection/null-fill
actually applied — SURVEY.md §5 "known looseness to NOT replicate").
"""

import json
import os

import pytest

from kafka_connect_morphlines_spark import Pipeline
from kafka_connect_morphlines_spark.record import wrap_value
from tests.conftest import FIXED_TS, PERSON

CONF = os.path.join(os.path.dirname(__file__), "resources", "pipelines.conf")


def pipe(morphline_id):
    return Pipeline.from_file(CONF, morphline_id=morphline_id)


def test_noop_identity(person_struct_env):
    """MorphlineTransformTest.testNoOpResource:142-173 — passthrough keeps
    the envelope and the value intact."""
    out = pipe("noop")(person_struct_env)
    assert out.columns == person_struct_env.columns
    row = out.collect()[0]
    assert row["_topic"] == "testing"
    assert row["_kafkaPartition"] == 1
    assert row["_timestamp"] == FIXED_TS
    assert row["_value"].asDict() == PERSON


def test_readjson(person_json_env):
    """MorphlineTransformTest.testReadJson:244-263 — JSON string in ->
    4 typed fields out."""
    out = pipe("readjson")(person_json_env)
    row = out.collect()[0]
    assert row["first_name"] == "example"
    assert row["last_name"] == "user"
    assert row["email"] == "example.user@example.com"
    assert row["age"] == 27  # typed int, not string


def test_readavro(person_struct_env):
    """MorphlineTransformTest.testReadAvro:265-284 — struct in -> typed
    struct out (projection applied via toConnectData)."""
    out = pipe("readavro")(person_struct_env)
    row = out.collect()[0]
    v = row["_value"].asDict()
    assert v == {"first_name": "example", "last_name": "user", "email": "example.user@example.com", "age": 27}


def test_readline(person_json_env):
    """MorphlineTransformTest.testReadLine:286-301 — exact output string
    equality on the line payload."""
    out = pipe("readline")(person_json_env)
    rows = out.collect()
    assert len(rows) == 1
    assert json.loads(rows[0]["message"]) == PERSON


def test_enrichjson(spark):
    """MorphlineTransformTest.testEnrichJson:175-213 — `etc` preserved,
    `missing` null-filled, unknown fields dropped."""
    df = spark.createDataFrame(
        [("whatever", 42, True, "etc", "unknown-extra")],
        "dont string, abc int, foo boolean, etc string, zzz string",
    )
    env = wrap_value(df, timestamp_ms=FIXED_TS)
    out = pipe("enrichjson")(env)
    row = out.collect()[0]
    v = row["_value"].asDict()
    assert v["etc"] == "etc"
    assert v["missing"] is None
    assert v["abc"] == 42 and v["foo"] is True and v["dont"] == "whatever"
    assert "zzz" not in v  # unknown field dropped


def test_drop(person_struct_env):
    """MorphlineTransformTest.testDrop:215-242 — transform yields nothing."""
    out = pipe("drop")(person_struct_env)
    assert out.count() == 0


def test_enrichjson_timestamp_millis(spark):
    """EnrichJsonBuilder.java:292-317 — ISO-8601 strings parse to epoch
    millis for timestamp-millis longs; numeric epochs pass through."""
    from kafka_connect_morphlines_spark import compile_pipeline

    schema = json.dumps(
        {
            "type": "record",
            "name": "Evt",
            "fields": [
                {"name": "name", "type": ["null", "string"]},
                {"name": "ts", "type": [{"type": "long", "logicalType": "timestamp-millis"}, "null"]},
            ],
        }
    )
    df = spark.createDataFrame(
        [('{"name":"a","ts":"2017-01-20T08:55:02.123Z"}',), ('{"name":"b","ts":1484897702123}',)],
        "payload string",
    )
    p = compile_pipeline([{"enrichJson": {"valueField": "payload", "outputField": "out", "schemaString": schema}}])
    rows = {r["out"]["name"]: r["out"]["ts"] for r in p(df).collect()}
    assert rows == {"a": 1484902502123, "b": 1484897702123}


def test_first_only_smt_compat(spark):
    """MorphlineTransform.java:123 — the reference SMT returns ONLY the
    first collected record per input record (getRecords().get(0)), so a
    1->N command like readLine yields exactly the first line.  With
    ``settings { firstOnly : true }`` the engine pins that contract; the
    native default keeps the full 1->N superset."""
    from kafka_connect_morphlines_spark import compile_pipeline

    spec = """
    settings { firstOnly : true }
    morphlines : [{
      id : lines
      commands : [
        { readLine { inputField : body, outputField : message } }
      ]
    }]
    """
    df = spark.createDataFrame(
        [("r1", "alpha\nbeta\ngamma"), ("r2", "only")], "key string, body string"
    )
    p = compile_pipeline(spec, morphline_id="lines")
    assert p.first_only is True
    rows = {r["key"]: r["message"] for r in p(df).collect()}
    # exactly one record per input, and it is the FIRST emission
    assert rows == {"r1": "alpha", "r2": "only"}
    # the native default is the 1->N superset
    native = compile_pipeline(
        [{"readLine": {"inputField": "body", "outputField": "message"}}]
    )
    assert native.first_only is False
    assert sorted(r["message"] for r in native(df).collect()) == [
        "alpha", "beta", "gamma", "only",
    ]
