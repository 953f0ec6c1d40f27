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
