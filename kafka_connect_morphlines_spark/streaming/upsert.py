"""Idempotent upsert sink: last-writer-wins by key across micro-batches.

The exactly-once story for a foreachBatch sink is the SINK's contract:
Structured Streaming replays a failed epoch, so the sink must make
re-processing epoch N indistinguishable from processing it once
(SURVEY.md §3.2; the reference's per-put begin/commit TX notifications,
MorphlineSinkTask.java:129-149, push the same burden onto the connector).

This sink realizes the contract with epoch-staged writes:

1. ``put(df, epoch)`` overwrites ``<root>/_staging/epoch=<N>`` — a replay
   of epoch N clobbers its own partial output, never duplicates it;
2. publish compacts all staged epochs into ``<root>/current`` keeping, per
   key, the row from the HIGHEST epoch (ties within an epoch broken by the
   ordered tie_cols), and applies deletes (``op_col == 'delete'``).

At 100 TB the compaction step is what table formats (Delta/Iceberg MERGE)
do incrementally with file-level pruning; the rewrite-all publish here is
the format-free equivalent with the same observable semantics, and the
staging layout is exactly a manual copy of their transaction log.  The
per-key winner pick is one map-side-combined max_by aggregate — no window
sort.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class UpsertParquetSink:
    """``sink(df, epoch)`` callable for streaming/runner.run_stream.

    ``key_cols`` identify a row; the latest epoch wins per key.  When
    ``op_col`` is set, rows whose op value equals ``delete_value`` tombstone
    the key instead of updating it.
    """

    def __init__(
        self,
        root: str,
        key_cols: list[str],
        op_col: str | None = None,
        delete_value: str = "delete",
    ) -> None:
        self.root = root
        self.key_cols = list(key_cols)
        self.op_col = op_col
        self.delete_value = delete_value

    def _staging(self) -> str:
        return os.path.join(self.root, "_staging")

    def current_path(self) -> str:
        return os.path.join(self.root, "current")

    def __call__(self, df: DataFrame, epoch_id: int) -> None:
        # idempotence: a replayed epoch overwrites its own directory
        df.write.mode("overwrite").parquet(
            os.path.join(self._staging(), f"epoch={int(epoch_id)}")
        )
        self._publish(df.sparkSession)

    def _publish(self, spark: SparkSession) -> None:
        # `epoch` materializes as the partition column from the dir layout
        all_staged = spark.read.option("basePath", self._staging()).parquet(
            os.path.join(self._staging(), "epoch=*")
        )
        data_cols = [c for c in all_staged.columns if c != "epoch"]
        # per-key winner in one max_by-style aggregate: struct max orders by
        # epoch first, then the payload columns (deterministic tie-break)
        payload = F.struct(F.col("epoch").cast("long").alias("_e"), *[F.col(c) for c in data_cols])
        latest = (
            all_staged.groupBy(*[F.col(c) for c in self.key_cols])
            .agg(F.max(payload).alias("_w"))
            .select(*[F.col(f"_w.{c}").alias(c) for c in data_cols])
        )
        if self.op_col is not None:
            latest = latest.filter(
                F.coalesce(F.col(self.op_col) != F.lit(self.delete_value), F.lit(True))
            ).drop(self.op_col)
        # publish via overwrite; readers of current/ see the compacted state
        latest.write.mode("overwrite").parquet(self.current_path())

    def read_current(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.current_path())


class SketchParquetSink:
    """Epoch-staged sink for MERGEABLE sketches (count-min, DDSketch — any
    (keys..., cnt) table where merge = union + sum).

    Same exactly-once argument as :class:`UpsertParquetSink`: each
    micro-batch overwrites its own ``_staging/epoch=<N>`` partial, so epoch
    replay is idempotent; but publication is a SUM-merge across epochs
    (bucket counts commute) instead of last-writer-wins — the streaming
    maintenance path for quantile/frequency monitors.  ``read_merged``
    re-aggregates the staged partials (epochs x sketch-size rows, never
    event volume); a periodic compaction can fold old epochs into one
    without changing the result, by the same commutativity.
    """

    def __init__(self, root: str, merge_keys: list[str], value_col: str = "cnt") -> None:
        self.root = root
        self.merge_keys = list(merge_keys)
        self.value_col = value_col

    def __call__(self, sketch_df: DataFrame, epoch_id: int) -> None:
        sketch_df.write.mode("overwrite").parquet(
            os.path.join(self.root, "_staging", f"epoch={int(epoch_id)}")
        )

    def read_merged(self, spark: SparkSession) -> DataFrame:
        staged = spark.read.parquet(os.path.join(self.root, "_staging"))
        return staged.groupBy(*self.merge_keys).agg(
            F.sum(self.value_col).alias(self.value_col)
        )
