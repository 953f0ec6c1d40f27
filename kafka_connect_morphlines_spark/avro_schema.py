"""Avro schema JSON -> Spark StructType.

The reference binds Avro schemas to pipelines via the
``schemaString`` / ``schemaFile`` / ``schemaField`` triad
(KafkaDataProducerCommandBuilder.java:139-219, ToConnectDataBuilder.java:88-105,
EnrichJsonBuilder.java:110-136) and traverses unions-with-null, arrays, nested
records and the ``timestamp-millis`` logical type
(EnrichJsonBuilder.java:231-345).  This module performs the equivalent
compile-time conversion so the bound schema becomes a frame-wide StructType
(per SURVEY.md §1.3: Spark cannot carry a per-row schema object; we bind per
pipeline).

Mapping follows the public Avro spec (avro.apache.org/docs/current/spec.html)
and mirrors what spark-avro's SchemaConverters does:
  null->NullType  boolean->Boolean  int->Integer  long->Long  float->Float
  double->Double  bytes->Binary  string->String  enum->String  fixed->Binary
  record->Struct  array->Array  map->Map(String, V)
  union ["null", T] -> nullable T      (general unions unsupported, like Spark)
  logical date->Date, time-millis/micros->Long/Long, timestamp-millis/micros
    ->Timestamp, decimal->Decimal(precision, scale)
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


class AvroSchemaError(ValueError):
    pass


def avro_to_spark(schema: str | dict | list) -> T.DataType:
    """Convert an Avro schema (JSON string or parsed tree) to a Spark type."""
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith(("{", "[", '"')):
            return _convert(json.loads(s))
        return _convert(s)  # bare primitive name
    return _convert(schema)


def avro_struct(schema: str | dict) -> T.StructType:
    dt = avro_to_spark(schema)
    if not isinstance(dt, T.StructType):
        raise AvroSchemaError(f"expected an Avro record schema, got {dt.simpleString()}")
    return dt


def _convert(node: Any) -> T.DataType:
    if isinstance(node, str):
        if node in _PRIMITIVES:
            return _PRIMITIVES[node]
        raise AvroSchemaError(f"unsupported/unresolved Avro type name {node!r}")
    if isinstance(node, list):  # union
        non_null = [n for n in node if n != "null"]
        if len(non_null) != 1:
            raise AvroSchemaError(f"only unions with null are supported, got {node!r}")
        return _convert(non_null[0])
    if not isinstance(node, dict):
        raise AvroSchemaError(f"bad Avro schema node: {node!r}")

    logical = node.get("logicalType")
    typ = node["type"]
    if logical:
        if logical == "date":
            return T.DateType()
        if logical in ("timestamp-millis", "timestamp-micros"):
            return T.TimestampType()
        if logical in ("time-millis", "time-micros"):
            return T.LongType()
        if logical == "decimal":
            return T.DecimalType(int(node.get("precision", 10)), int(node.get("scale", 0)))
        # unknown logical type: fall through to the underlying type

    if typ == "record":
        fields = []
        for f in node["fields"]:
            ftype = f["type"]
            nullable = _is_nullable(ftype)
            fields.append(T.StructField(f["name"], _convert(ftype), nullable))
        return T.StructType(fields)
    if typ == "array":
        items = node["items"]
        return T.ArrayType(_convert(items), containsNull=_is_nullable(items))
    if typ == "map":
        values = node["values"]
        return T.MapType(T.StringType(), _convert(values), valueContainsNull=_is_nullable(values))
    if typ == "enum":
        return T.StringType()
    if typ == "fixed":
        return T.BinaryType()
    return _convert(typ)


def _is_nullable(node: Any) -> bool:
    return isinstance(node, list) and "null" in node


def timestamp_millis_fields(schema: str | dict, prefix: str = "") -> list[str]:
    """Dotted paths of fields with the Avro ``timestamp-millis`` logical type.

    enrichJson parses ISO-8601 strings into epoch millis for such fields
    (EnrichJsonBuilder.java:292-317); callers use these paths to apply the
    same coercion.
    """
    if isinstance(schema, str):
        schema = json.loads(schema)
    out: list[str] = []

    def walk(node: Any, path: str) -> None:
        if isinstance(node, list):
            for n in node:
                if n != "null":
                    walk(n, path)
            return
        if not isinstance(node, dict):
            return
        if node.get("logicalType") == "timestamp-millis":
            out.append(path)
            return
        typ = node.get("type")
        if typ == "record":
            for f in node["fields"]:
                walk(f["type"], f"{path}.{f['name']}" if path else f["name"])
        elif typ == "array":
            walk(node["items"], path)
        elif isinstance(typ, (dict, list)):
            walk(typ, path)

    walk(schema, prefix)
    return out
