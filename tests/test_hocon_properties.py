"""Property-based tests: HOCON parser round-trip over generated JSON-shaped
trees (HOCON is a JSON superset, so every JSON document must parse to the
same structure), plus template compilation totality."""

import json

from hypothesis import given, settings, strategies as st

from kafka_connect_morphlines_spark import hocon
from kafka_connect_morphlines_spark.templates import has_template

json_scalars = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.booleans(),
    st.none(),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters='"\\'), max_size=20),
)

json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(alphabet="abcdefgh_", min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=20,
)

json_objects = st.dictionaries(st.text(alphabet="abcdefgh_", min_size=1, max_size=8), json_values, max_size=5)


def _normalize(v):
    """HOCON cannot distinguish '1' from 1 in unquoted position, but our
    generator emits *quoted* JSON, so values must round-trip exactly —
    except floats (not generated) and nothing else."""
    return v


@settings(max_examples=150, deadline=None)
@given(json_objects)
def test_json_documents_parse_identically(doc):
    text = json.dumps(doc)
    assert hocon.loads(text, env={}) == doc


@settings(max_examples=150, deadline=None)
@given(json_objects)
def test_hocon_colon_form_round_trips(doc):
    # re-render as `key : value` lines at top level
    lines = [f"{json.dumps(k)} : {json.dumps(v)}" for k, v in doc.items()]
    assert hocon.loads("\n".join(lines), env={}) == doc


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=40))
def test_has_template_total(s):
    has_template(s)  # never raises


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.sampled_from(["a", "b", "c"]), st.integers(-5, 5), min_size=1, max_size=3))
def test_env_substitution_round_trip(env_vals):
    env = {k.upper(): str(v) for k, v in env_vals.items()}
    text = "\n".join(f"{k} : ${{?{k.upper()}}}" for k in env_vals)
    out = hocon.loads(text, env=env)
    assert out == {k: v for k, v in env_vals.items()}


# --- Avro schema converter properties ---------------------------------------

avro_primitives = st.sampled_from(["string", "int", "long", "float", "double", "boolean", "bytes"])


def avro_field_types():
    return st.recursive(
        st.one_of(avro_primitives, st.tuples(avro_primitives).map(lambda t: ["null", t[0]])),
        lambda children: st.one_of(
            st.builds(lambda it: {"type": "array", "items": it}, children),
            st.builds(lambda vt: {"type": "map", "values": vt}, children),
            st.builds(
                lambda fields: {
                    "type": "record",
                    "name": "R",
                    "fields": [{"name": f"f{i}", "type": t} for i, t in enumerate(fields)],
                },
                st.lists(children, min_size=1, max_size=3),
            ),
        ),
        max_leaves=8,
    )


@settings(max_examples=100, deadline=None)
@given(st.lists(avro_field_types(), min_size=1, max_size=4))
def test_avro_converter_total_and_null_unions(field_types):
    from pyspark.sql import types as T

    from kafka_connect_morphlines_spark.avro_schema import avro_struct

    schema = {
        "type": "record",
        "name": "Top",
        "fields": [{"name": f"c{i}", "type": t} for i, t in enumerate(field_types)],
    }
    out = avro_struct(json.dumps(schema))
    assert isinstance(out, T.StructType)
    assert len(out.fields) == len(field_types)
    for f, t in zip(out.fields, field_types):
        # union-with-null -> nullable field (SURVEY §1.3 mapping)
        assert f.nullable == (isinstance(t, list) and "null" in t)
