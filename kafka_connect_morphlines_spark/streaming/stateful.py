"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no stateful stream processing at all (SURVEY.md §2:
"stateful ops: none beyond head/sample counters") — this is the
Spark-native extension surface: arbitrary per-key state kept by the engine's
state store, Arrow-batched user logic, watermark-driven timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUTPUT_SCHEMA = "user_id long, batch_events long, total_events long"
RUNNING_STATE_SCHEMA = "total long"


def running_event_counts(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Per-key running event counter: emits (key, batch_events, total_events)
    each micro-batch, with the cumulative total held in managed state.

    The canonical shape for custom streaming aggregations the built-in
    windowed aggs can't express (counters, CDC folds, session carry-over).
    """

    def update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        batch = sum(len(pdf) for pdf in pdfs)
        (total,) = state.get if state.exists else (0,)
        total += batch
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "batch_events": [batch], "total_events": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        RUNNING_OUTPUT_SCHEMA,
        RUNNING_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# --- transformWithState (Spark 4 arbitrary-state API) ----------------------
# The successor to applyInPandasWithState: typed state variables (value /
# list / map) with per-state TTL, timers, and initial-state bootstrap.
# State lives in the engine's state store (RocksDB on a cluster), so the
# operator scales with keys x state size per key, not stream length.

TOTALS_OUTPUT_SCHEMA = "user_id long, batch_sum double, running_sum double"


class RunningSumProcessor(StatefulProcessor):
    """Per-key running sum with optional state TTL (idle keys expire)."""

    def __init__(self, value_col: str, ttl_ms: int | None = None):
        self._value_col = value_col
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("running_sum", "total double", self._ttl_ms)

    def handleInputRows(self, key, rows, timerValues):
        batch = float(sum(pdf[self._value_col].sum() for pdf in rows))
        prior = self._state.get()
        total = (prior[0] if prior else 0.0) + batch
        self._state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "batch_sum": [batch], "running_sum": [total]})

    def close(self) -> None:
        return None


def running_value_sums(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running sum via ``transformWithStateInPandas`` — the Spark 4
    arbitrary-state operator (typed ValueState + TTL).  Emits
    (key, batch_sum, running_sum) per key per micro-batch; with ``ttl_ms``
    set, state for idle keys is evicted by the store, which is what bounds
    memory when the key space is unbounded (e.g. user ids at 100 TB).

    Requires the RocksDB state store provider (session default in
    ``get_spark``) and the ``protobuf`` package (transformWithState's state
    protocol; bundled on real Spark clusters, absent in this test image —
    hence the import gate; ``running_event_counts`` is the tested fallback).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas needs the protobuf package for its "
            "state-server protocol; use running_event_counts (applyInPandasWithState) instead"
        ) from e
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=RunningSumProcessor(value_col, ttl_ms),
        outputStructType=TOTALS_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="processingTime" if ttl_ms else "none",
    )


def dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with bounded state:
    ``withWatermark(ts, delay).dropDuplicatesWithinWatermark(keys)``.

    The watermark bounds how long a key is remembered, so state is
    O(keys-per-delay-window) instead of O(stream) — the only form of
    streaming dedup that survives an unbounded stream.  Batch frames fall
    back to plain dropDuplicates (same result, no state).
    """
    if not df.isStreaming:
        return df.dropDuplicates(key_cols)
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(key_cols)
