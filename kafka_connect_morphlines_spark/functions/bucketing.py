"""Bucketed-table layout helpers: the co-located join path.

At 100 TB the dominant cost of a fact-fact join (lineitem<->orders,
events<->events) is the shuffle.  Writing both tables bucketed on the join
key with the same bucket count lets Spark plan the join with ZERO exchanges
— each task reads bucket i of both sides.  The same layout makes
aggregations on the bucket key exchange-free.

This module is thin on purpose: bucketing is a *layout contract* between
writer and reader, not an operator.  ``write_bucketed`` pins the contract
(bucketBy + sortBy + saveAsTable — Spark only honors buckets through the
catalog, not bare parquet paths); readers just ``spark.table(...)`` and the
optimizer does the rest.  tests/test_plans.py asserts the exchange-free
plan so a layout regression can't hide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    n_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and optionally sorted)
    on the join/agg key.  ``n_buckets`` must match across tables that will
    co-join; pick it so one bucket of the largest table fits an executor
    (e.g. 100 TB / 4096 buckets ~ 25 GB per bucket pre-pruning)."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (a named alias for ``spark.table`` that
    documents the layout contract at call sites)."""
    return spark.table(table)
