"""grok — regex extraction with named pattern dictionaries (kite grok,
SURVEY.md §2 B.2: the flagship morphline text operator).

Strategy (per SURVEY.md §2 mapping): expand ``%{NAME:field}`` references
against the pattern dictionary *at compile time* into one concrete Java
regex, then emit one ``regexp_extract`` per named capture group — fully
JVM-side, codegen-friendly, no UDF.

The built-in dictionary below is the commonly-published Logstash/grok core
subset (public patterns; grok dictionaries are a de-facto standard format).
Additional dictionaries load from ``dictionaryFiles`` / ``dictionaryString``
(kite config keys).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, functions as F

from kafka_connect_morphlines_spark.commands import command
from kafka_connect_morphlines_spark.pipeline import CompiledCommand, PipelineSpecError
from kafka_connect_morphlines_spark.templates import colref

# Core grok patterns (public de-facto standard, trimmed to what pipelines use).
BUILTIN_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    "BASE10NUM": r"(?:[+-]?(?:[0-9]+(?:\.[0-9]+)?)|\.[0-9]+)",
    "NUMBER": r"(?:%{BASE10NUM})",
    "BASE16NUM": r"(?:0[xX])?[0-9a-fA-F]+",
    "POSINT": r"\b(?:[1-9][0-9]*)\b",
    "NONNEGINT": r"\b(?:[0-9]+)\b",
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "QUOTEDSTRING": r"(?:\"(?:\\.|[^\\\"]+)*\"|'(?:\\.|[^\\']+)*')",
    "UUID": r"[A-Fa-f0-9]{8}-(?:[A-Fa-f0-9]{4}-){3}[A-Fa-f0-9]{12}",
    "IPV4": r"(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)",
    "IPV6": r"(?:[0-9A-Fa-f]{0,4}:){2,7}(?:[0-9A-Fa-f]{0,4}|%{IPV4})",
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "HOSTNAME": r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*\.?\b",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HOSTPORT": r"%{IPORHOST}:%{POSINT}",
    "PATH": r"(?:%{UNIXPATH}|%{WINPATH})",
    "UNIXPATH": r"(?:/[\w_%!$@:.,+~-]*)+",
    "WINPATH": r"(?:[A-Za-z]:|\\)(?:\\[^\\?*]*)+",
    "URIPROTO": r"[A-Za-z]([A-Za-z0-9+.-]+)+",
    "URIHOST": r"%{IPORHOST}(?::%{POSINT})?",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\[\]-]*)+",
    "URIQUERY": r"[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\[\]<>-]*",
    "URIPARAM": r"\?%{URIQUERY}",
    "URIPATHPARAM": r"%{URIPATH}(?:\?%{URIQUERY})?",
    "URI": r"%{URIPROTO}://(?:%{USER}(?::[^@]*)?@)?(?:%{URIHOST})?(?:%{URIPATH}(?:\?%{URIQUERY})?)?",
    "MONTH": r"\b(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|Nov(?:ember)?|Dec(?:ember)?)\b",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "DAY": r"(?:Mon(?:day)?|Tue(?:sday)?|Wed(?:nesday)?|Thu(?:rsday)?|Fri(?:day)?|Sat(?:urday)?|Sun(?:day)?)",
    "YEAR": r"(?:\d\d){1,2}",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    "SECOND": r"(?:(?:[0-5][0-9]|60)(?:[:.,][0-9]+)?)",
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "DATE_US": r"%{MONTHNUM}[/-]%{MONTHDAY}[/-]%{YEAR}",
    "DATE_EU": r"%{MONTHDAY}[./-]%{MONTHNUM}[./-]%{YEAR}",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "ISO8601_SECOND": r"(?:%{SECOND}|60)",
    "TIMESTAMP_ISO8601": r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}(?::?%{SECOND})?%{ISO8601_TIMEZONE}?",
    "DATE": r"%{DATE_US}|%{DATE_EU}",
    "DATESTAMP": r"%{DATE}[- ]%{TIME}",
    "TZ": r"(?:[PMCE][SD]T|UTC|GMT)",
    "SYSLOGTIMESTAMP": r"%{MONTH} +%{MONTHDAY} %{TIME}",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"%{PROG:program}(?:\[%{POSINT:pid}\])?",
    "SYSLOGHOST": r"%{IPORHOST}",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "QS": r"%{QUOTEDSTRING}",
    "LOGLEVEL": r"(?:[Aa]lert|ALERT|[Tt]race|TRACE|[Dd]ebug|DEBUG|[Nn]otice|NOTICE|[Ii]nfo|INFO|[Ww]arn?(?:ing)?|WARN?(?:ING)?|[Ee]rr?(?:or)?|ERR?(?:OR)?|[Cc]rit?(?:ical)?|CRIT?(?:ICAL)?|[Ff]atal|FATAL|[Ss]evere|SEVERE|EMERG(?:ENCY)?|[Ee]merg(?:ency)?)",
    "COMMONAPACHELOG": r'%{IPORHOST:clientip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] "(?:%{WORD:verb} %{NOTSPACE:request}(?: HTTP/%{NUMBER:httpversion})?|%{DATA:rawrequest})" %{NUMBER:response} (?:%{NUMBER:bytes}|-)',
}

_REF_RE = re.compile(r"%\{(\w+)(?::([\w\[\]\.@-]+))?(?::(\w+))?\}")


def _load_dictionaries(config, ctx) -> dict[str, str]:
    patterns = dict(BUILTIN_PATTERNS)
    texts = []
    for path in config.get("dictionaryFiles", []):
        if not os.path.isabs(path):
            path = os.path.join(ctx.base_dir, path)
        with open(path, encoding="utf-8") as f:
            texts.append(f.read())
    if config.get("dictionaryString"):
        texts.append(config["dictionaryString"])
    for text in texts:
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            name, _, pat = line.partition(" ")
            if name and pat:
                patterns[name] = pat.strip()
    return patterns


def expand_grok(expr: str, patterns: dict[str, str]) -> tuple[str, list[tuple[str, str]]]:
    """Expand ``%{NAME:field:type}`` refs into a concrete regex.

    Returns (regex, [(field, type), ...]) where each captured field becomes a
    Java-regex named group ``g0, g1, ...`` (grok field names may contain
    characters Java group names can't).
    """
    captures: list[tuple[str, str]] = []

    def repl(m: re.Match, depth: int = 0) -> str:
        name, field, typ = m.group(1), m.group(2), m.group(3)
        if name not in patterns:
            raise PipelineSpecError(f"unknown grok pattern %{{{name}}}")
        inner = _expand(patterns[name], depth + 1)
        if field:
            captures.append((field, typ or "string"))
            return f"(?<g{len(captures) - 1}>{inner})"
        return f"(?:{inner})"

    def _expand(pat: str, depth: int) -> str:
        if depth > 20:
            raise PipelineSpecError("grok pattern recursion too deep")
        return _REF_RE.sub(lambda m: repl(m, depth), pat)

    return _expand(expr, 0), captures


def group_indices(regex: str) -> dict[str, int]:
    """Positional index of every named capture group in a Java/PCRE regex.

    Needed because ``regexp_extract`` addresses groups positionally, and the
    expanded dictionary patterns contain their own (unnamed) capturing groups.
    """
    out: dict[str, int] = {}
    idx = 0
    i = 0
    n = len(regex)
    in_class = False
    while i < n:
        c = regex[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
            i += 1
            continue
        if c == "[":
            in_class = True
            i += 1
            continue
        if c == "(":
            if regex.startswith("(?<", i) and not regex.startswith("(?<=", i) and not regex.startswith("(?<!", i):
                end = regex.index(">", i)
                idx += 1
                out[regex[i + 3 : end]] = idx
            elif not regex.startswith("(?", i):
                idx += 1
        i += 1
    return out


_GROK_TYPES = {"int": "long", "long": "long", "float": "double", "double": "double", "string": "string"}


@command("grok")
def grok(config, ctx):
    """Compile grok expressions to ``regexp_extract`` columns.

    Config (kite grok): ``expressions { field : pattern }``,
    ``dictionaryFiles``, ``dictionaryString``, ``extract ∈ {true,false,inplace}``,
    ``numRequiredMatches`` (atLeastOnce|once|all — row filtered if unmatched).
    """
    patterns = _load_dictionaries(config, ctx)
    expressions = config.get("expressions", {})
    extract = str(config.get("extract", "true")).lower()
    required = config.get("numRequiredMatches", "atLeastOnce")

    compiled = []  # (input_field, regex, captures, name->positional index)
    for in_fld, expr in expressions.items():
        regex, captures = expand_grok(str(expr), patterns)
        compiled.append((in_fld, regex, captures, group_indices(regex)))

    # expose the match conjunction as a predicate so grok can serve as an
    # `if`/`tryRules`/`not` condition (kite pipelines routinely branch on
    # whether a grok expression matched)
    match_pred = None
    if required != "never":
        for in_fld, regex, _, _ in compiled:
            m = colref(in_fld).cast("string").rlike(regex)
            match_pred = m if match_pred is None else (match_pred & m)

    def transform(df: DataFrame) -> DataFrame:
        keep_pred = None
        for in_fld, regex, captures, indices in compiled:
            col = colref(in_fld).cast("string")
            matched = col.rlike(regex)
            if extract != "false":
                assignments = {}
                for i, (field, typ) in enumerate(captures):
                    v = F.regexp_extract(col, regex, indices[f"g{i}"])
                    spark_t = _GROK_TYPES.get(typ, "string")
                    if spark_t != "string":
                        v = v.try_cast(spark_t)
                    else:
                        v = F.when(matched, v)  # unmatched -> null, not ''
                    assignments[field] = v
                df = df.withColumns(assignments)
            if required != "never":
                keep_pred = matched if keep_pred is None else (keep_pred & matched)
        return df.filter(keep_pred) if keep_pred is not None else df

    from kafka_connect_morphlines_spark.pipeline import CompiledCommand

    return CompiledCommand("grok", transform, predicate=match_pred)
