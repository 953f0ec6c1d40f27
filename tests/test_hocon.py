"""HOCON parser unit tests (dialect used by the reference's config/*.conf)."""

import os

import pytest

from kafka_connect_morphlines_spark import hocon


def test_basic_object():
    assert hocon.loads("a : 1\nb = two\nc : true") == {"a": 1, "b": "two", "c": True}


def test_nested_and_dotted_keys():
    out = hocon.loads("a { b : 1 }\na.c : 2")
    assert out == {"a": {"b": 1, "c": 2}}


def test_separator_free_object_value():
    out = hocon.loads("solrLocator { collection : c1\n zkHost : \"127.0.0.1:9983\" }")
    assert out["solrLocator"]["collection"] == "c1"
    assert out["solrLocator"]["zkHost"] == "127.0.0.1:9983"


def test_arrays_of_objects_newline_separated():
    text = """
    morphlines : [
      {
        id : m1
        commands : [
          { logInfo { format : "hi" } }
          { dropRecord {} }
        ]
      }
    ]
    """
    out = hocon.loads(text)
    cmds = out["morphlines"][0]["commands"]
    assert [next(iter(c)) for c in cmds] == ["logInfo", "dropRecord"]


def test_comments_both_styles():
    out = hocon.loads("# hash\n// slashes\na : 1 # trailing\nb : 2 // trailing")
    assert out == {"a": 1, "b": 2}


def test_env_substitution(monkeypatch):
    out = hocon.loads("x : ${?MISSING_VAR_123}\ny : 1", env={})
    assert "x" not in out and out["y"] == 1
    out = hocon.loads("x : ${?MY_VAR}", env={"MY_VAR": "42"})
    assert out["x"] == 42


def test_self_reference_substitution():
    out = hocon.loads("a : 7\nb : ${a}", env={})
    assert out["b"] == 7


def test_required_substitution_missing_raises():
    with pytest.raises(hocon.HoconError):
        hocon.loads("x : ${nope.nothing}", env={})


def test_unquoted_strings_with_specials():
    out = hocon.loads('id : "base-@{_topic}-x"\npath : /slash/path')
    assert out["id"] == "base-@{_topic}-x"
    assert out["path"] == "/slash/path"


def test_include(tmp_path):
    inc = tmp_path / "inner.conf"
    inc.write_text("shared : { x : 1 }")
    main = tmp_path / "main.conf"
    main.write_text(f'include "{inc.name}"\ny : 2')
    out = hocon.load(str(main))
    assert out == {"shared": {"x": 1}, "y": 2}


def test_triple_quoted_string():
    out = hocon.loads('code : """line1\nline2"""')
    assert out["code"] == "line1\nline2"


def test_duplicate_object_keys_merge():
    out = hocon.loads("a { x : 1 }\na { y : 2 }")
    assert out["a"] == {"x": 1, "y": 2}


def test_pipeline_from_file_url_and_resource(spark, tmp_path):
    """morphlineFile resolution parity (MorphlineTransform.java:166-181):
    file:// URLs, resource: names, and inline `include` text all load."""
    from kafka_connect_morphlines_spark import pipeline as pipeline_mod
    from kafka_connect_morphlines_spark.pipeline import Pipeline

    conf = tmp_path / "m.conf"
    conf.write_text(
        'morphlines : [ { id : m1, commands : [ { setValues { a : "1" } } ] } ]'
    )
    p = Pipeline.from_file(f"file://{conf}", morphline_id="m1")
    assert [c.name for c in p.commands] == ["setValues"]

    pipeline_mod.RESOURCE_PATHS.append(str(tmp_path))
    try:
        p = Pipeline.from_file("resource:m.conf", morphline_id="m1")
        assert [c.name for c in p.commands] == ["setValues"]
    finally:
        pipeline_mod.RESOURCE_PATHS.remove(str(tmp_path))

    p = Pipeline.from_file(f'include "{conf}"', morphline_id="m1")
    assert [c.name for c in p.commands] == ["setValues"]


def test_pipeline_from_file_resource_missing(spark):
    import pytest

    from kafka_connect_morphlines_spark.pipeline import Pipeline, PipelineSpecError

    with pytest.raises(PipelineSpecError, match="resource"):
        Pipeline.from_file("resource:definitely-not-there.conf")
