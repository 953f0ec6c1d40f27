"""Command registry — the engine's analog of the morphline CommandBuilder SPI.

The reference discovers commands via ``CommandBuilder.getNames()`` and the
``importCommands`` wildcards in every pipeline (FromConnectDataBuilder.java:33-44,
config/cloudsolr.conf:18).  Here, a command is a *compiler*:
``(config: dict, ctx: CompileContext) -> Transform | CompiledCommand`` — it
runs once at pipeline-compile time and emits native DataFrame transforms.
"""

from __future__ import annotations

from collections.abc import Callable

REGISTRY: dict[str, Callable] = {}


def command(*names: str) -> Callable:
    """Register a command compiler under one or more morphline names."""

    def deco(fn: Callable) -> Callable:
        for n in names:
            REGISTRY[n] = fn
        return fn

    return deco


# populate the registry
from kafka_connect_morphlines_spark.commands import (  # noqa: E402,F401
    fields,
    filters,
    grok,
    parsers,
    python_cmd,
    schema,
    sinks,
    uri,
)
