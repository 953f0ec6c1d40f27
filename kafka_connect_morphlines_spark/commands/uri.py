"""URI decomposition commands (kite extractURIComponents /
extractURIComponent / extractURIQueryParameters — SURVEY.md §2 B.2).

All compile to Spark's native ``parse_url`` (JVM-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafka_connect_morphlines_spark.commands import command
from kafka_connect_morphlines_spark.templates import colref

_COMPONENTS = {
    "scheme": "PROTOCOL",
    "authority": "AUTHORITY",
    "host": "HOST",
    "path": "PATH",
    "query": "QUERY",
    "fragment": "REF",
    "userInfo": "USERINFO",
    "file": "FILE",
}


@command("extractURIComponents")
def extract_uri_components(config, ctx):
    in_fld = config.get("inputField")
    prefix = config.get("outputPrefix", "")
    col = colref(in_fld).cast("string")

    def transform(df: DataFrame) -> DataFrame:
        assignments = {prefix + name: F.parse_url(col, F.lit(part)) for name, part in _COMPONENTS.items()}
        # port isn't a parse_url part; derive it from the authority
        assignments[prefix + "port"] = F.regexp_extract(F.parse_url(col, F.lit("AUTHORITY")), r":(\d+)$", 1).try_cast("int")
        return df.withColumns(assignments)

    return transform


@command("extractURIComponent")
def extract_uri_component(config, ctx):
    in_fld = config.get("inputField")
    out_fld = config.get("outputField")
    component = config.get("component")
    col = colref(in_fld).cast("string")
    if component == "port":
        value = F.regexp_extract(F.parse_url(col, F.lit("AUTHORITY")), r":(\d+)$", 1).try_cast("int")
    else:
        value = F.parse_url(col, F.lit(_COMPONENTS.get(component, str(component).upper())))

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(out_fld, value)

    return transform


@command("extractURIQueryParameters")
def extract_uri_query_parameters(config, ctx):
    in_fld = config.get("inputField")
    out_fld = config.get("outputField")
    parameter = config.get("parameter")
    col = colref(in_fld).cast("string")

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(out_fld, F.parse_url(col, F.lit("QUERY"), F.lit(parameter)))

    return transform


@command("canonicalizeURI")
def canonicalize_uri(config, ctx):
    """Beyond-kite extension of the URI family: normalize a URL field for
    identity comparison (web.canonicalize_url — scheme/host case, www,
    default ports, tracking params, fragments, trailing slashes).  Config:
    ``inputField``, ``outputField`` (default = in place)."""
    from kafka_connect_morphlines_spark.functions.web import canonicalize_url

    in_fld = config.get("inputField")
    out_fld = config.get("outputField", in_fld)
    value = canonicalize_url(colref(in_fld).cast("string"))

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(out_fld, value)

    return transform
