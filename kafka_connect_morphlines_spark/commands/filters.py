"""Filter / predicate / control-flow commands.

Reference surface (SURVEY.md §2 B.2): dropRecord, contains, equals, not, if,
tryRules, sample, head, separateAttachments, log* commands (no-ops in a
compiled plan), metrics commands.

Morphline failure semantics: a predicate command "failing" a record means the
record is dropped from the pipeline (MorphlineTransform.java:113-121 returns
null on a failed process).  In relational terms that is exactly ``filter``.
Conditionals (``if``/``tryRules``) compile to a single-column ``when`` cascade
when branches are pure value transforms, and otherwise to filtered branches
reunited with ``unionByName`` — Catalyst handles both shapes natively.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame, functions as F, types as T

from kafka_connect_morphlines_spark.commands import command
from kafka_connect_morphlines_spark.pipeline import CompiledCommand, PipelineSpecError
from kafka_connect_morphlines_spark.templates import colref, template_to_column


@command("dropRecord")
def drop_record(config, ctx):
    """Unconditionally drop (kite dropRecord; reference usage
    src/test/resources/.../transform.conf:128, asserted
    MorphlineTransformTest.java:215-242)."""
    pred = F.lit(False)
    return CompiledCommand("dropRecord", lambda df: df.filter(pred), predicate=pred)


def _contains_pred(field: str, values) -> Column:
    if not isinstance(values, list):
        values = [values]
    col = colref(field)
    return functools.reduce(lambda a, b: a | b, [col.cast("string") == str(v) for v in values])


@command("contains")
def contains(config, ctx):
    """Record passes iff each named field's value is one of the listed values."""
    preds = [_contains_pred(fld, vals) for fld, vals in config.items()]
    pred = functools.reduce(lambda a, b: a & b, preds)
    return CompiledCommand("contains", lambda df: df.filter(pred), predicate=pred)


@command("equals")
def equals(config, ctx):
    """Record passes iff each named field equals the given value (templated)."""
    preds = []
    for fld, v in config.items():
        target = template_to_column(v)
        preds.append(colref(fld).cast("string").eqNullSafe(target.cast("string")))
    pred = functools.reduce(lambda a, b: a & b, preds)
    return CompiledCommand("equals", lambda df: df.filter(pred), predicate=pred)


@command("not")
def not_cmd(config, ctx):
    """Invert a nested predicate command."""
    inner = ctx.compile_command(config)
    if inner.predicate is None:
        raise PipelineSpecError(f"'not' requires a predicate command, got {inner.name!r}")
    pred = ~inner.predicate
    return CompiledCommand("not", lambda df: df.filter(pred), predicate=pred)


def _conjunction(ctx, commands: list) -> Column | None:
    """AND of predicate commands; None if any member is not a pure predicate."""
    preds = []
    for entry in commands:
        c = ctx.compile_command(entry)
        if c.predicate is None:
            return None
        preds.append(c.predicate)
    if not preds:
        return F.lit(True)
    return functools.reduce(lambda a, b: a & b, preds)


def _apply_chain(df: DataFrame, chain) -> DataFrame:
    return functools.reduce(lambda acc, cmd: cmd(acc), chain, df)


@command("if")
def if_cmd(config, ctx):
    """Conditional sub-pipeline (kite ``if { conditions then else }``).

    Compiled as: rows matching the conjunction of ``conditions`` flow through
    ``then``, the rest through ``else``, reunited by name.  When a branch
    drops rows (e.g. ``dropRecord``) this degenerates to a plain filter.
    """
    pred = _conjunction(ctx, config.get("conditions", []))
    then_chain = ctx.compile_chain(config.get("then", []))
    else_chain = ctx.compile_chain(config.get("else", []))
    if pred is None:
        raise PipelineSpecError("'if' conditions must be predicate commands (contains/equals/not)")

    def transform(df: DataFrame) -> DataFrame:
        then_df = _apply_chain(df.filter(pred), then_chain)
        else_df = _apply_chain(df.filter(~pred | pred.isNull()), else_chain)
        if not else_chain and not then_chain:
            return df
        return then_df.unionByName(else_df, allowMissingColumns=True)

    return transform


@command("tryRules")
def try_rules(config, ctx):
    """First-match rule list (kite tryRules).

    Each rule's *leading predicate commands* form its match condition; the
    remaining commands are its body.  A row flows through the body of the
    first rule whose condition it satisfies.  Rows matching no rule are
    dropped (the reference throws if ``throwExceptionIfAllRulesFailed``, which
    in a relational plan maps to dropping the row into a DLQ — see
    streaming.runner quarantine support).
    """
    rules = config.get("rules", [])
    compiled = []  # (predicate, body_chain)
    for rule in rules:
        commands = rule.get("commands", rule if isinstance(rule, list) else [])
        preds = []
        body_start = 0
        for i, entry in enumerate(commands):
            c = ctx.compile_command(entry)
            if c.predicate is not None:
                preds.append(c.predicate)
                body_start = i + 1
            else:
                break
        pred = functools.reduce(lambda a, b: a & b, preds) if preds else F.lit(True)
        compiled.append((pred, ctx.compile_chain(commands[body_start:])))

    def transform(df: DataFrame) -> DataFrame:
        out = None
        remaining = F.lit(True)
        for pred, body in compiled:
            branch = _apply_chain(df.filter(remaining & pred), body)
            out = branch if out is None else out.unionByName(branch, allowMissingColumns=True)
            remaining = remaining & ~F.coalesce(pred, F.lit(False))
        return out if out is not None else df.filter(F.lit(False))

    return transform


@command("routeBySchema")
def route_by_schema(config, ctx):
    """Heterogeneous-topic dispatch (SURVEY §7.3.1): route a mixed-schema
    stream into per-schema sub-pipelines and union the results by name —
    the first-class command form of ``pipeline.branch_by_schema`` (the
    frame-wide analog of the reference's per-record ``_valueSchema``
    dispatch, MorphlineTransform.java:141-143, where schema travels as
    data and one morphline sees the heterogeneous stream).

    Config::

        routeBySchema {
          branches : [
            { when : "get_json_object(_value, '$.type') = 'order'"
              commands : [ { readJson {...} } ... ] }
            { when : "..." commands : [...] }
          ]
          otherwise : [ {...} ]   # optional; unclaimed rows drop if absent
        }

    ``when`` is a SQL predicate over the envelope (a JSON discriminator
    field, the record key, a schema-registry id prefix).  First matching
    branch claims the row (tryRules semantics); each branch filter pushes
    into the shared scan, so routing adds one pass and no shuffle.
    """
    branches = config.get("branches", [])
    if not branches:
        raise PipelineSpecError("routeBySchema needs a non-empty 'branches' list")
    compiled = []
    for br in branches:
        when = br.get("when")
        if not when:
            raise PipelineSpecError("each routeBySchema branch needs a 'when' SQL predicate")
        compiled.append((F.expr(when), ctx.compile_chain(br.get("commands", []))))
    otherwise_chain = (
        ctx.compile_chain(config["otherwise"]) if "otherwise" in config else None
    )

    def transform(df: DataFrame) -> DataFrame:
        from kafka_connect_morphlines_spark.pipeline import branch_by_schema

        pairs = [(pred, lambda d, c=chain: _apply_chain(d, c)) for pred, chain in compiled]
        otherwise = (
            (lambda d, c=otherwise_chain: _apply_chain(d, c))
            if otherwise_chain is not None
            else None
        )
        return branch_by_schema(df, pairs, otherwise=otherwise)

    return CompiledCommand("routeBySchema", transform, wide=True)


@command("pipe")
def pipe_cmd(config, ctx):
    """Named sub-pipeline grouping (kite ``pipe``: every ``morphlines`` block
    is one — e.g. reference config/cloudsolr.conf:9-82).  Compiles to plain
    function composition of the child chain."""
    chain = ctx.compile_chain(config.get("commands", []))

    def transform(df: DataFrame) -> DataFrame:
        return _apply_chain(df, chain)

    return transform


@command("callParentPipe")
def call_parent_pipe(config, ctx):
    """Kite ``callParentPipe`` re-enters the root pipe after a parser emits.
    In a declarative plan the chain already continues after the parser — the
    re-entry is implicit — so this compiles to identity."""

    def transform(df: DataFrame) -> DataFrame:
        return df

    return transform


@command("sample")
def sample(config, ctx):
    """Bernoulli sample (kite sample: probability, seed).

    Two modes:
    - default: Spark's ``df.sample`` (per-partition XORShift — fast, but
      the kept set depends on partitioning and engine internals);
    - ``deterministic: true`` + ``keyField``: keep a row iff the 60-bit
      md5-uniform of ``seed:key`` falls below probability.  The kept set
      is then a pure function of the data — stable across partitioning,
      cluster size, engines (a DuckDB oracle reproduces it exactly), and
      re-runs, which is what a reproducible training-data pipeline wants
      from its sampling stage.
    """
    p = float(config.get("probability", 1.0))
    seed = config.get("seed")
    if config.get("deterministic"):
        key = config.get("keyField")
        if not key:
            raise PipelineSpecError("sample with deterministic:true needs a keyField")
        threshold = int(p * (1 << 60))
        u = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), colref(key).cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")

        def transform_det(df: DataFrame) -> DataFrame:
            return df.filter(u < threshold)

        return transform_det

    def transform(df: DataFrame) -> DataFrame:
        return df.sample(fraction=p, seed=seed)

    return transform


@command("head")
def head(config, ctx):
    """Pass only the first N rows (kite head: limit)."""
    n = int(config.get("limit", config.get("_value", 1)))

    def transform(df: DataFrame) -> DataFrame:
        return df.limit(n)

    return CompiledCommand("head", transform, wide=True)


@command("separateAttachments", "explode")
def separate_attachments(config, ctx):
    """Fan out one row per element of an array field (1->N).

    Kite separateAttachments fans one record per attachment; the Spark analog
    is ``explode`` on the configured array column (default: the attachment
    body column when it is an array).
    """
    fld = config.get("inputField", config.get("field", "_attachment_body"))
    out = config.get("outputField", fld)

    def transform(df: DataFrame) -> DataFrame:
        return df.withColumn(out, F.explode(colref(fld)))

    return transform


def _noop(config, ctx):
    def transform(df: DataFrame) -> DataFrame:
        return df

    return transform


# Log commands (reference uses them in every pipeline, e.g. cloudsolr.conf:22) —
# in a compiled declarative plan they are no-ops; debug runners may print.
for _name in ("logTrace", "logDebug", "logInfo", "logWarn", "logError"):
    command(_name)(_noop)

# JMX/JVM metrics registration stay no-ops BY DESIGN: Spark already
# publishes executor/driver JVM metrics and per-query metrics through its
# own MetricsSystem (JMX sink available via metrics.properties) and the
# Spark UI — re-registering Codahale JVM gauges inside a pipeline would
# duplicate what the engine exports natively.  SLF4J and CSV are
# implemented for real below.
for _name in (
    "startReportingMetricsToJMX",
    "registerJVMMetrics",
):
    command(_name)(_noop)


@command("startReportingMetricsToSLF4J")
def start_reporting_metrics_to_slf4j(config, ctx):
    """Kite ``startReportingMetricsToSLF4J { logger : "..." }`` (available
    to every reference pipeline via the org.kitesdk.** wildcard,
    config/cloudsolr.conf:18): arms logger metrics reporting for the rest
    of the chain.  Downstream ``observe`` commands register Observations
    and ``Pipeline.flush_metrics()`` logs one Codahale-Slf4jReporter-style
    line per (metric, key) — ``type=GAUGE, name=<id>.<metric>.<key>,
    value=<v>`` — per action rather than per interval (same per-action
    contract as the CSV reporter).  Composes with
    startReportingMetricsToCSV: both sinks drain on the same flush."""
    from kafka_connect_morphlines_spark.pipeline import PipelineMetrics

    logger_name = str(config.get("logger", config.get("_value", "metrics")))
    if ctx.metrics is None:
        ctx.metrics = PipelineMetrics(logger_name=logger_name)
    else:
        ctx.metrics.logger_name = logger_name

    def transform(df: DataFrame) -> DataFrame:
        return df

    return transform


@command("startReportingMetricsToCSV")
def start_reporting_metrics_to_csv(config, ctx):
    """Kite ``startReportingMetricsToCSV { outputDir }`` (imported by every
    reference config via the org.kitesdk.** wildcard,
    config/cloudsolr.conf:18): arms CSV metrics reporting for the rest of
    the chain.  Downstream ``observe`` commands then register real
    ``Observation`` handles and ``Pipeline.flush_metrics()`` appends one
    file per metric under ``outputDir`` — per-action rather than the
    reference's per-interval reporter thread (the honest batch analog; a
    DataFrame has no steady-state to sample between actions)."""
    from kafka_connect_morphlines_spark.pipeline import PipelineMetrics, PipelineSpecError

    out_dir = config.get("outputDir", config.get("_value"))
    if not out_dir:
        raise PipelineSpecError("startReportingMetricsToCSV needs outputDir")
    if ctx.metrics is None:
        ctx.metrics = PipelineMetrics(csv_dir=str(out_dir))
    else:  # compose with an earlier SLF4J reporter: one flush, both sinks
        ctx.metrics.csv_dir = str(out_dir)

    def transform(df: DataFrame) -> DataFrame:
        return df

    return transform


@command("observe")
def observe(config, ctx):
    """Engine extension: named row-count metric via ``df.observe`` — the
    Spark-native replacement for the reference's per-command Codahale record
    counters (Metrics import, MorphlineSinkTask.java:42).

    With CSV reporting armed (startReportingMetricsToCSV earlier in the
    chain) each batch application registers a ``pyspark.sql.Observation``
    whose values ``Pipeline.flush_metrics()`` writes after the action;
    streaming frames always use the string-named form, surfaced through
    ``progress.observedMetrics`` in the runner."""
    name = config.get("name", "observed")
    metrics = ctx.metrics  # captured at compile time (reporter must precede)

    def transform(df: DataFrame) -> DataFrame:
        if metrics is not None and not df.isStreaming:
            from pyspark.sql import Observation

            obs = Observation()
            metrics.pending.append((name, obs))
            return df.observe(obs, F.count(F.lit(1)).alias("numRecords"))
        return df.observe(name, F.count(F.lit(1)).alias("numRecords"))

    return transform
