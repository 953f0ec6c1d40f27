"""Property-based tests for the pure-Python Avro codec (avro_codec.py):
encode->decode must be the identity for every value a schema admits, for
random schemas and random conforming records, datum and container framing
alike.  No Spark session needed — this is the worker-side decode logic the
readAvro/readAvroContainer pandas UDFs run."""

from __future__ import annotations

import datetime
import math

from hypothesis import given, settings, strategies as st

from kafka_connect_morphlines_spark.avro_codec import (
    decode_datum,
    encode_datum,
    read_container,
    write_container,
)

field_names = st.text(alphabet="abcdefghij_", min_size=1, max_size=8)

# (schema, value-strategy) pairs for leaf types
_LEAVES = [
    ("boolean", st.booleans()),
    ("int", st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    ("long", st.integers(min_value=-(2**63), max_value=2**63 - 1)),
    ("double", st.floats(allow_nan=False, allow_infinity=False)),
    ("string", st.text(max_size=40)),
    ("bytes", st.binary(max_size=40)),
    (
        {"type": "long", "logicalType": "timestamp-millis"},
        st.datetimes(
            min_value=datetime.datetime(1900, 1, 1), max_value=datetime.datetime(2200, 1, 1)
        ).map(lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
    ),
    ({"type": "int", "logicalType": "date"}, st.dates()),
    ({"type": "enum", "name": "E", "symbols": ["A", "B", "C"]}, st.sampled_from(["A", "B", "C"])),
    ({"type": "fixed", "name": "Fx", "size": 4}, st.binary(min_size=4, max_size=4)),
]


@st.composite
def schema_and_value(draw, depth: int = 2):
    """A random (schema, conforming value) pair, recursing through records,
    arrays, maps, and nullable unions."""
    if depth == 0:
        schema, vs = draw(st.sampled_from(_LEAVES))
        return schema, draw(vs)
    kind = draw(st.sampled_from(["leaf", "leaf", "nullable", "array", "map", "record"]))
    if kind == "leaf":
        schema, vs = draw(st.sampled_from(_LEAVES))
        return schema, draw(vs)
    if kind == "nullable":
        inner_schema, inner_value = draw(schema_and_value(depth=depth - 1))
        if isinstance(inner_schema, list):  # no nested unions in Avro
            return inner_schema, inner_value
        value = draw(st.one_of(st.none(), st.just(inner_value)))
        return ["null", inner_schema], value
    if kind == "array":
        inner_schema, first = draw(schema_and_value(depth=0))
        n = draw(st.integers(min_value=0, max_value=4))
        return {"type": "array", "items": inner_schema}, [first] * n
    if kind == "map":
        inner_schema, first = draw(schema_and_value(depth=0))
        keys = draw(st.lists(field_names, max_size=3, unique=True))
        return {"type": "map", "values": inner_schema}, {k: first for k in keys}
    # record
    n_fields = draw(st.integers(min_value=1, max_value=4))
    names = draw(st.lists(field_names, min_size=n_fields, max_size=n_fields, unique=True))
    fields, value = [], {}
    for name in names:
        fschema, fvalue = draw(schema_and_value(depth=depth - 1))
        fields.append({"name": name, "type": fschema})
        value[name] = fvalue
    return {"type": "record", "name": "R", "fields": fields}, value


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=0, abs_tol=0) or (a == b)
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_eq(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_eq(x, y) for x, y in zip(a, b))
    return a == b


@settings(max_examples=200, deadline=None)
@given(schema_and_value())
def test_datum_roundtrip(sv):
    schema, value = sv
    assert _eq(decode_datum(encode_datum(value, schema), schema), value)


@settings(max_examples=75, deadline=None)
@given(
    st.lists(schema_and_value(depth=1), min_size=0, max_size=1),
    st.integers(min_value=0, max_value=5),
    st.sampled_from(["null", "deflate"]),
)
def test_container_roundtrip(seed, n_extra, codec):
    """Container framing: N copies of a conforming record survive the
    header/metadata/sync/block framing under both mandatory codecs."""
    if not seed:
        schema, records = {"type": "record", "name": "R", "fields": [{"name": "a", "type": "int"}]}, []
    else:
        inner_schema, value = seed[0]
        schema = {"type": "record", "name": "R", "fields": [{"name": "a", "type": inner_schema}]}
        records = [{"a": value}] * (n_extra + 1)
    buf = write_container(records, schema, codec=codec)
    got_schema, got = read_container(buf)
    assert got_schema["fields"][0]["name"] == "a"
    assert _eq(got, records)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_zigzag_long_roundtrip(n):
    assert decode_datum(encode_datum(n, "long"), "long") == n


MULTI_UNION = ["null", "int", "string", "boolean", {"type": "array", "items": "int"},
               {"type": "record", "name": "MR", "fields": [{"name": "a", "type": "long"}]}]


@settings(max_examples=100, deadline=None)
@given(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.text(max_size=20),
        st.lists(st.integers(min_value=0, max_value=9), max_size=4),
        st.fixed_dictionaries({"a": st.integers(min_value=-(2**62), max_value=2**62)}),
    )
)
def test_multi_branch_union_roundtrip(value):
    """Unions with several non-null branches pick the branch by the value's
    Python type (bool before int — bool subclasses int), so the bytes decode
    back to the same value, not a mis-typed one."""
    got = decode_datum(encode_datum(value, MULTI_UNION), MULTI_UNION)
    assert _eq(got, value)
    assert (type(got) is bool) == (type(value) is bool)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.text(max_size=30),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
)
def test_confluent_wire_roundtrip_property(schema_id, s, n):
    """Wire framing is lossless for any unsigned-32 schema id and record
    payload, and the header is exactly magic + 4 BE bytes."""
    from kafka_connect_morphlines_spark.avro_codec import decode_confluent, encode_confluent

    schema = {
        "type": "record",
        "name": "W",
        "fields": [{"name": "s", "type": "string"}, {"name": "n", "type": "long"}],
    }
    buf = encode_confluent({"s": s, "n": n}, schema, schema_id)
    assert buf[0] == 0 and int.from_bytes(buf[1:5], "big") == schema_id
    sid, val = decode_confluent(buf, schema)
    assert sid == schema_id and val == {"s": s, "n": n}
