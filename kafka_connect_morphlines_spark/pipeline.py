"""Pipeline spec -> compiled list of DataFrame transforms.

Reference lifecycle (MorphlineTransform.java:82-105, 166-195): parse the HOCON
file, apply config overrides (``override.withFallback(fileConfig)``), find the
``morphlines`` block matching ``morphlineId`` and compile it into a command
chain.  This module performs the same compilation, but each command compiles to
a native ``DataFrame -> DataFrame`` transform (Column expressions, not
record-at-a-time interpretation), so the resulting Pipeline is a logical-plan
builder Catalyst can optimize end to end.

Dataflow semantics (SURVEY.md §1.4): a command may emit 0, 1 or N rows per
input row — drop = ``filter``, 1->N = ``explode``.  The engine keeps full 1->N
semantics (a superset of the reference SMT's first-record-only contract);
``settings { firstOnly : true }`` opts into the reference's exact 0-or-1
behavior for migration parity (see Pipeline.first_only).
"""

from __future__ import annotations

import functools
import os as _os
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame

from kafka_connect_morphlines_spark import hocon

Transform = Callable[[DataFrame], DataFrame]

# Search roots for ``resource:`` morphlineFile paths — the Python analog of
# the reference's classpath lookup (MorphlineTransform.java:169
# ConfigFactory.parseResources).  Deployments append their config dirs.
RESOURCE_PATHS: list[str] = [
    _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), "examples"),
    _os.getcwd(),
]


class PipelineSpecError(ValueError):
    pass


@dataclass
class CompiledCommand:
    """A compiled command: a transform, optionally exposing a pure predicate.

    Predicate commands (``contains``/``equals``/``not`` — SURVEY.md §2 B.2) set
    ``predicate`` so conditional combinators (``if``, ``tryRules``) can compile
    to a single Column expression instead of branch/union plans.
    """

    name: str
    transform: Transform
    predicate: Column | None = None
    #: True for commands whose plan shuffles or unions (head/limit,
    #: routeBySchema) — they scramble within-partition row order, which
    #: first_only's "first emission" definition depends on.
    wide: bool = False

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.transform(df)


@dataclass
class PipelineMetrics:
    """Metrics-reporting state shared by the reporter + observe commands.

    The reference starts Codahale reporter threads
    (startReportingMetricsToCSV — kite stdlib, imported by every
    reference config via the org.kitesdk.** wildcard); the Spark-first
    analog reports per-ACTION instead of per-interval: each ``observe``
    command registers a ``pyspark.sql.Observation`` on the passing frame,
    and after the caller's action ``Pipeline.flush_metrics()`` appends one
    CSV row per (metric, key) to ``csv_dir`` — same file-per-metric layout
    as the Codahale CSV reporter, no background thread to leak.  Streaming
    frames keep the string-named ``df.observe`` form; the runner reads
    ``progress.observedMetrics`` per micro-batch (see streaming.runner).
    """

    #: CSV output dir (startReportingMetricsToCSV); None = CSV not armed
    csv_dir: str | None = None
    #: SLF4J-analog logger name (startReportingMetricsToSLF4J); None = off
    logger_name: str | None = None
    morphline_id: str = ""
    #: (metric_name, Observation) registered since the last flush
    pending: list = field(default_factory=list)

    @staticmethod
    def _resolved(obs) -> bool:
        """True iff the Observation's frame has completed an action, so
        ``obs.get`` returns immediately.  ``Observation.get`` BLOCKS until
        the first action on the observed frame — flushing an observation
        whose plan never ran would hang the caller forever (e.g. a
        foreachBatch thread flushing per micro-batch while a second,
        never-acted-on pipeline application is pending).  The JVM
        Observation exposes the non-blocking ``getRowOrEmpty`` Option
        accessor; an Observation never attached via ``df.observe`` has no
        JVM peer yet and is likewise unresolved."""
        jo = getattr(obs, "_jo", None)
        if jo is None:
            return False
        try:
            return not jo.getRowOrEmpty().isEmpty()
        except Exception:  # pragma: no cover - e.g. Connect-mode Observation
            return False

    def flush(self, morphline_id: str = "") -> list[str]:
        """Drain RESOLVED pending observations to the armed sinks (CSV
        files and/or the SLF4J-analog logger); returns the written CSV
        paths.  Call after the action that ran the pipeline.  Observations
        whose frame has not been acted on yet stay pending (they drain on
        a later flush) instead of blocking — so a pre-action flush, or a
        sink that performs no Spark action, is a safe no-op rather than a
        deadlock."""
        import csv
        import logging
        import os
        import time as _time

        ready = [(n, o) for n, o in self.pending if self._resolved(o)]
        if not ready:
            return []
        mid = morphline_id or self.morphline_id
        log = logging.getLogger(self.logger_name) if self.logger_name else None
        written = []
        if self.csv_dir:
            os.makedirs(self.csv_dir, exist_ok=True)
        for name, obs in ready:
            ts = int(_time.time())
            values = obs.get.items()
            if self.csv_dir:
                path = os.path.join(self.csv_dir, f"{name}.csv")
                fresh = not os.path.exists(path)
                with open(path, "a", newline="") as fh:
                    w = csv.writer(fh)
                    if fresh:
                        w.writerow(["ts", "morphline_id", "metric", "key", "value"])
                    for key, value in values:
                        w.writerow([ts, mid, name, key, value])
                written.append(path)
            if log is not None:
                # Codahale Slf4jReporter line layout: type=GAUGE, name=..., value=...
                for key, value in values:
                    log.info(
                        "type=GAUGE, name=%s, value=%s",
                        ".".join(p for p in (mid, name, key) if p),
                        value,
                    )
        drained = {id(o) for _, o in ready}
        self.pending = [(n, o) for n, o in self.pending if id(o) not in drained]
        return written


@dataclass
class CompileContext:
    base_dir: str = "."
    settings: dict[str, Any] = field(default_factory=dict)
    metrics: "PipelineMetrics | None" = None

    def compile_chain(self, commands: list[dict[str, Any]]) -> list[CompiledCommand]:
        return [self.compile_command(c) for c in commands]

    def compile_command(self, entry: dict[str, Any]) -> CompiledCommand:
        from kafka_connect_morphlines_spark.commands import REGISTRY

        if not isinstance(entry, dict) or len(entry) != 1:
            raise PipelineSpecError(f"a command must be a single-key object, got {entry!r}")
        name, config = next(iter(entry.items()))
        if name not in REGISTRY:
            raise PipelineSpecError(f"unknown command {name!r}")
        if config is None:
            config = {}
        if not isinstance(config, dict):
            config = {"_value": config}
        compiled = REGISTRY[name](dict(config), self)
        if isinstance(compiled, CompiledCommand):
            compiled.name = compiled.name or name
            return compiled
        return CompiledCommand(name=name, transform=compiled)


@dataclass
class Pipeline:
    """An ordered chain of compiled commands, applied with ``df.transform``.

    ``first_only`` is the reference SMT's 0-or-1-record compat contract
    (MorphlineTransform.java:123 returns ``getRecords().get(0)``): when a
    command fans one input record out to N, only the FIRST emitted record
    survives.  Enabled by ``settings { firstOnly : true }`` in the spec (or
    the same path via overrides).  The engine's native semantics stay 1->N
    (a superset); this switch exists for migration parity, not the hot
    path — it tags each input row, then one id-keyed window picks the
    first emission (emission order = within-partition row order, which
    narrow SMT chains — map/filter/explode — preserve)."""

    commands: list[CompiledCommand]
    morphline_id: str = ""
    first_only: bool = False
    metrics: "PipelineMetrics | None" = None

    def flush_metrics(self) -> list[str]:
        """Write any Observation metrics registered by ``observe`` commands
        to the CSV dir configured by ``startReportingMetricsToCSV``.  Call
        after the action that executed the pipeline output.  No-op (empty
        list) when CSV reporting isn't configured."""
        if self.metrics is None:
            return []
        return self.metrics.flush(self.morphline_id)

    def __call__(self, df: DataFrame) -> DataFrame:
        return self.apply(df)

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.first_only:
            return functools.reduce(lambda acc, cmd: cmd(acc), self.commands, df)
        # firstOnly picks "the first emission per input row" via
        # monotonically_increasing_id + an id-keyed window — both of which
        # are only well-defined on a batch frame whose chain preserves
        # within-partition order.  Fail loudly instead of silently picking
        # an arbitrary row (or blowing up at runtime on a stream).
        if df.isStreaming:
            raise PipelineSpecError(
                "settings { firstOnly : true } is a batch-only compat mode: "
                "monotonically_increasing_id and an unwatermarked window are "
                "undefined on a streaming DataFrame.  Run the SMT chain in "
                "micro-batch (foreachBatch) or drop firstOnly."
            )
        wide = [c.name for c in self.commands if c.wide]
        if wide:
            raise PipelineSpecError(
                f"settings {{ firstOnly : true }} requires a narrow command "
                f"chain (map/filter/explode): {wide!r} shuffle or union, which "
                f"scrambles the within-partition emission order that defines "
                f"'first'.  Remove firstOnly or move these commands out of "
                f"the chain."
            )
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        tagged = df.withColumn("_smt_input_id", F.monotonically_increasing_id())
        out = functools.reduce(lambda acc, cmd: cmd(acc), self.commands, tagged)
        if "_smt_input_id" not in out.columns:
            # a projection command dropped the tag (e.g. extract*Paths with
            # flatten) — every surviving row already maps 1:1 to an input
            return out
        out = out.withColumn("_smt_emit_pos", F.monotonically_increasing_id())
        w = Window.partitionBy("_smt_input_id").orderBy("_smt_emit_pos")
        return (
            out.withColumn("_smt_rn", F.row_number().over(w))
            .filter(F.col("_smt_rn") == 1)
            .drop("_smt_input_id", "_smt_emit_pos", "_smt_rn")
        )

    @staticmethod
    def from_file(path: str, morphline_id: str | None = None, overrides: dict[str, Any] | None = None) -> "Pipeline":
        """Load a morphline config from a filesystem path, ``resource:``
        name, ``file://``/``http(s)://`` URL, or inline ``include`` text —
        the reference's morphlineFile resolution surface
        (MorphlineTransform.java:166-181: parseResources / parseString /
        parseURL with filesystem fallback)."""
        import os
        import urllib.parse
        import urllib.request

        if path.startswith("resource:"):
            name = path.split(":", 1)[1].lstrip("/")
            for root in RESOURCE_PATHS:
                cand = os.path.join(root, name)
                if os.path.exists(cand):
                    spec = hocon.load(cand)
                    return compile_pipeline(
                        spec, morphline_id=morphline_id, overrides=overrides,
                        base_dir=os.path.dirname(os.path.abspath(cand)),
                    )
            raise PipelineSpecError(
                f"resource {name!r} not found on RESOURCE_PATHS {RESOURCE_PATHS}"
            )
        if path.startswith("include "):
            # inline indirection: the morphlineFile VALUE is itself HOCON text
            spec = hocon.loads(path, base_dir=os.getcwd())
            return compile_pipeline(spec, morphline_id=morphline_id, overrides=overrides, base_dir=os.getcwd())
        parsed = urllib.parse.urlparse(path)
        if parsed.scheme == "file":
            local = urllib.request.url2pathname(parsed.path)
            spec = hocon.load(local)
            return compile_pipeline(
                spec, morphline_id=morphline_id, overrides=overrides,
                base_dir=os.path.dirname(os.path.abspath(local)),
            )
        if parsed.scheme in ("http", "https"):
            with urllib.request.urlopen(path, timeout=30) as resp:  # noqa: S310
                text = resp.read().decode("utf-8")
            spec = hocon.loads(text, base_dir=os.getcwd())
            return compile_pipeline(spec, morphline_id=morphline_id, overrides=overrides, base_dir=os.getcwd())
        spec = hocon.load(path)
        return compile_pipeline(spec, morphline_id=morphline_id, overrides=overrides, base_dir=os.path.dirname(os.path.abspath(path)))


def branch_by_schema(
    df: DataFrame,
    branches: list[tuple[Any, "Pipeline | Any"]],
    otherwise: "Pipeline | Any | None" = None,
) -> DataFrame:
    """Route a mixed-schema topic into per-schema pipelines and union the
    results — the frame-wide analog of the reference's per-record
    ``_valueSchema`` dispatch (SURVEY §7.3.1).

    The reference binds a schema to each record and lets one pipeline see a
    heterogeneous stream; a DataFrame binds one schema per *frame*, so mixed
    topics are handled by branching: each ``(predicate, pipeline)`` pair
    claims the records matching its predicate (first match wins, like
    tryRules), the matching slice runs through that pipeline, and the
    branch outputs union by column name (missing columns null-filled).
    ``otherwise`` catches unclaimed records (DLQ them, or drop when None).

    Predicates are Column expressions or SQL strings over the envelope
    (typically on a discriminator: a JSON type field, the record key, or a
    schema-registry id prefix).  Each branch filter is pushed into the
    shared scan — one pass over the source, no shuffle added by the
    branching itself.
    """
    from pyspark.sql import functions as F

    def _pred(p) -> Any:
        return F.expr(p) if isinstance(p, str) else p

    outs = []
    claimed = F.lit(False)
    for pred, pipe in branches:
        # NULL-fold to false (mirrors tryRules' pred.isNull() handling):
        # a predicate over a malformed/NULL discriminator must not claim
        # the row NOR poison `claimed` to NULL — those rows belong to
        # `otherwise` (the quarantine branch exists for exactly them).
        p = F.coalesce(_pred(pred), F.lit(False))
        outs.append(pipe(df.filter(p & ~claimed)))
        claimed = claimed | p
    if otherwise is not None:
        outs.append(otherwise(df.filter(~claimed)))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o, allowMissingColumns=True)
    return out


def _deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = v
    return dst


def compile_pipeline(
    spec: dict[str, Any] | str | list,
    morphline_id: str | None = None,
    overrides: dict[str, Any] | None = None,
    base_dir: str = ".",
) -> Pipeline:
    """Compile a pipeline spec (HOCON text/path, dict, or bare command list)."""
    import os

    if isinstance(spec, str):
        if "\n" not in spec and os.path.exists(spec):
            return Pipeline.from_file(spec, morphline_id, overrides)
        spec = hocon.loads(spec, base_dir=base_dir)
    if isinstance(spec, list):  # bare command list
        spec = {"commands": spec}
    if overrides:
        spec = _deep_merge(dict(spec), overrides)

    if "commands" in spec:
        commands, mid = spec["commands"], morphline_id or ""
    else:
        morphlines = spec.get("morphlines")
        if not isinstance(morphlines, list) or not morphlines:
            raise PipelineSpecError("spec has neither 'commands' nor a 'morphlines' list")
        if morphline_id is None:
            block = morphlines[0]
        else:
            matches = [m for m in morphlines if m.get("id") == morphline_id]
            if not matches:
                raise PipelineSpecError(f"no morphline with id {morphline_id!r}")
            block = matches[0]
        commands, mid = block.get("commands", []), block.get("id", "")

    ctx = CompileContext(base_dir=base_dir, settings=dict(spec.get("settings", {})))
    compiled = ctx.compile_chain(commands)  # may attach ctx.metrics
    return Pipeline(
        commands=compiled,
        morphline_id=mid,
        first_only=bool(ctx.settings.get("firstOnly", False)),
        metrics=ctx.metrics,
    )
