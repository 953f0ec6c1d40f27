"""Beyond-reference operator library for large-scale training-data pipelines:
deduplication, similarity search, text analysis, multimodal columns.

These are first-class engine components (BASELINE.json north star), built on
the joins/aggregations Spark provides and designed for 100 TB: no driver-side
collects, no global sorts, broadcast for small sides, salted/banded shuffles
for the quadratic parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input has fewer
    partitions (e.g. a single small parquet file -> 1 partition -> 1 core).

    At real scale the scan already has >= cores partitions and this is a
    no-op; the guard exists so compute-heavy per-row operators (minhash,
    simhash, feature extraction) never serialize onto one core because the
    *input layout* was coarse.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
