"""File-table source with parquet edge-case handling.

Spark (through 4.x) rejects parquet INT64 TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL) that other engines (DuckDB, arrow) read fine.  The
loader flips the ``nanosAsLong`` legacy conf and rebuilds proper timestamps
(truncated to micros, matching DuckDB's cast-to-TIMESTAMP floor semantics) —
a schema fix-up only: the scan itself stays columnar with pushdown intact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Column names stored as parquet timestamp[ns], via the arrow footer."""
    try:
        import pyarrow.parquet as pq  # noqa: PLC0415

        if os.path.isdir(path):
            inner = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not inner:
                return []
            path = os.path.join(path, inner[0])
        schema = pq.read_schema(path)
        out = []
        for field in schema:
            t = field.type
            if str(t).startswith("timestamp[ns"):
                out.append(field.name)
        return out
    except Exception:
        return []


def load_parquet(spark: SparkSession, path: str) -> DataFrame:
    # Engine semantics pin UTC (timestamps compare bit-for-bit with
    # UTC-naive external oracles); harmless when already UTC, load-bearing
    # when the caller's session inherited a local timezone.
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass
    # Spark 4.x reads parquet timestamp-without-tz columns as TIMESTAMP_NTZ
    # by default; NTZ forbids cast-to-long and watermark interval arithmetic.
    # Session TZ is pinned UTC above, so plain TIMESTAMP has identical values
    # — ask for the 3.5 behavior (runtime conf: covers caller-owned sessions).
    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass
    nanos_cols = _nanos_timestamp_cols(path)
    if nanos_cols:
        try:
            spark.conf.set(_NANOS_CONF, "true")
        except Exception:
            pass
        df = spark.read.parquet(path)
        for c in nanos_cols:
            # long nanos -> timestamp at micro precision (floor, like DuckDB).
            # Integer `div`, NOT `/`: epoch nanos (~1.7e18) exceed double's
            # 2^53 exact range, so float division is off by ±1 micro.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        return _denormalize_ntz(df)
    return _denormalize_ntz(spark.read.parquet(path))


def _denormalize_ntz(df: DataFrame) -> DataFrame:
    """Backstop: cast any TIMESTAMP_NTZ column to TIMESTAMP.

    Value-preserving because the session TZ is pinned UTC; only reachable if
    the inferTimestampNTZ conf could not be applied (locked-down session).
    """
    from pyspark.sql.types import TimestampNTZType  # noqa: PLC0415

    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_parquet(spark, f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> list[str]:
    """Register every table under ``sf_dir`` as a temp view for raw
    ``spark.sql`` querying — the SQL entry point next to the DataFrame API
    (mirrors how the DuckDB oracle harness sees the same data).  Returns
    the registered names.  Views go through :func:`load_table`, so the NTZ
    and TIMESTAMP_NANOS fix-ups apply to SQL users too."""
    import glob as _glob
    import os as _os

    if names is None:
        names = sorted(
            _os.path.splitext(_os.path.basename(p))[0]
            for p in _glob.glob(_os.path.join(sf_dir, "*.parquet"))
        )
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
    return list(names)
