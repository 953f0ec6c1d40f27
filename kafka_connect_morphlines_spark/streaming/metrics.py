"""Metrics: the Spark-native replacement for the reference's Codahale
counters (per-command record counts via ``Metrics``, import at
MorphlineSinkTask.java:42; ``startReportingMetricsTo*`` commands, SURVEY.md
§2 B.2).

Two pieces compose:
- the ``observe`` command (commands/filters.py) plants named row-count
  observations at any point in a pipeline — zero-cost accumulators evaluated
  with the plan;
- ``MetricsListener`` collects per-micro-batch progress (rows, duration,
  observed metrics) from the streaming engine, the analog of a Codahale
  reporter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class BatchMetric:
    query_name: str
    batch_id: int
    num_input_rows: int
    duration_ms: int
    observed: dict[str, Any] = field(default_factory=dict)


class MetricsListener(StreamingQueryListener):
    """Collects per-batch metrics; attach with ``spark.streams.addListener``."""

    def __init__(self) -> None:
        self.batches: list[BatchMetric] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        observed = dict(p.observedMetrics) if p.observedMetrics else {}
        self.batches.append(
            BatchMetric(
                query_name=p.name or "",
                batch_id=p.batchId,
                num_input_rows=int(p.numInputRows),
                duration_ms=int(p.batchDuration),
                observed={k: v.asDict() if hasattr(v, "asDict") else v for k, v in observed.items()},
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> MetricsListener:
    listener = MetricsListener()
    spark.streams.addListener(listener)
    return listener
