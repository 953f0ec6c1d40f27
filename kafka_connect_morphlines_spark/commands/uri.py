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


@command("userAgent")
def user_agent(config, ctx):
    """Kite useragent module's ``userAgent`` command, re-expressed as the
    deterministic core ruleset (the module wraps the ua_parser regex
    database; this is the precedence-ordered family/OS subset that covers
    the overwhelming share of real traffic, as pure codegen
    regexp/contains expressions — no per-executor parser state).

    Config: ``inputField`` (required), ``outputPrefix`` (default ``ua_``).
    Emits <prefix>family, <prefix>major, <prefix>os.  Precedence: bots
    first (family tokens hide inside bot UAs), then Edge before Chrome
    before Safari (Chromium UAs carry all three tokens), Opera via OPR/.
    """
    from kafka_connect_morphlines_spark.pipeline import PipelineSpecError

    in_fld = config.get("inputField")
    if not in_fld:
        raise PipelineSpecError("userAgent needs inputField")
    prefix = config.get("outputPrefix", "ua_")

    def transform(df: DataFrame) -> DataFrame:
        ua = colref(in_fld).cast("string")
        low = F.lower(ua)
        is_bot = low.rlike("bot|crawler|spider|slurp")
        family = (
            F.when(ua.isNull(), F.lit(None).cast("string"))
            .when(is_bot, "Bot")
            .when(ua.contains("Edg/") | ua.contains("Edge/"), "Edge")
            .when(ua.contains("OPR/") | ua.contains("Opera"), "Opera")
            .when(ua.contains("Chrome/"), "Chrome")
            .when(ua.contains("Firefox/"), "Firefox")
            .when(ua.contains("Safari/"), "Safari")
            .when(ua.contains("MSIE ") | ua.contains("Trident/"), "IE")
            .otherwise("Other")
        )
        ver = (
            F.when(family == "Edge", F.regexp_extract(ua, r"Edge?/(\d+)", 1))
            .when(family == "Opera", F.regexp_extract(ua, r"(?:OPR|Version)/(\d+)", 1))
            .when(family == "Chrome", F.regexp_extract(ua, r"Chrome/(\d+)", 1))
            .when(family == "Firefox", F.regexp_extract(ua, r"Firefox/(\d+)", 1))
            .when(family == "Safari", F.regexp_extract(ua, r"Version/(\d+)", 1))
            .when(family == "IE", F.regexp_extract(ua, r"(?:MSIE |rv:)(\d+)", 1))
            .otherwise(F.lit(""))
        )
        os_family = (
            F.when(ua.isNull(), F.lit(None).cast("string"))
            .when(ua.contains("Windows NT"), "Windows")
            .when(ua.contains("iPhone") | ua.contains("iPad"), "iOS")
            .when(ua.contains("Mac OS X"), "Mac OS X")
            .when(ua.contains("Android"), "Android")
            .when(ua.contains("Linux"), "Linux")
            .otherwise("Other")
        )
        return (
            df.withColumn(f"{prefix}family", family)
            .withColumn(f"{prefix}major", F.when(ver == "", None).otherwise(ver))
            .withColumn(f"{prefix}os", os_family)
        )

    return transform
