"""TIMESTAMP_NTZ regression gate.

PySpark 4.1 flipped ``spark.sql.parquet.inferTimestampNTZ.enabled`` to true,
so parquet ``timestamp[us]`` columns without a timezone (exactly what the
testdata ships) load as TIMESTAMP_NTZ — which forbids ``cast("long")``
(sessionize) and watermark interval arithmetic (streaming).  The loader pins
the conf false and casts any residual NTZ columns (sources/files.py); these
tests write a no-tz parquet with pyarrow and drive both the batch and
streaming legs so the next Spark default-flip is caught in-repo.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from kafka_connect_morphlines_spark.sources.files import load_parquet
from kafka_connect_morphlines_spark.streaming import runner


@pytest.fixture()
def ntz_parquet(tmp_path):
    """events-shaped parquet whose ts column is timestamp[us] WITHOUT tz."""
    ts0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = {
        "user_id": list(range(8)),
        "ts": [ts0 + datetime.timedelta(minutes=13 * i) for i in range(8)],
        "event_type": ["click", "purchase"] * 4,
        "value": [float(i) for i in range(8)],
    }
    table = pa.table(
        rows,
        schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),  # no tz — the NTZ trigger
                ("event_type", pa.string()),
                ("value", pa.float64()),
            ]
        ),
    )
    # a directory (readStream's file source requires one) holding one file
    d = tmp_path / "ntz_events.parquet"
    d.mkdir()
    pq.write_table(table, str(d / "part-0.parquet"))
    return str(d)


def test_loader_yields_instant_timestamps(spark, ntz_parquet):
    df = load_parquet(spark, ntz_parquet)
    [ts_field] = [f for f in df.schema.fields if f.name == "ts"]
    assert isinstance(ts_field.dataType, TimestampType)
    # the exact operation that broke sessionize under NTZ
    assert df.select(F.col("ts").cast("long")).count() == 8


def test_loader_backstop_casts_residual_ntz(spark, ntz_parquet):
    """Even when NTZ inference is forced on (a locked-down session the
    loader can't reconfigure would behave the same), the backstop cast
    still yields instant timestamps."""
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw = spark.read.parquet(ntz_parquet)
        assert isinstance(raw.schema["ts"].dataType, TimestampNTZType)  # trigger is real
        from kafka_connect_morphlines_spark.sources.files import _denormalize_ntz

        fixed = _denormalize_ntz(raw)
        assert isinstance(fixed.schema["ts"].dataType, TimestampType)
        assert fixed.select(F.col("ts").cast("long")).count() == 8
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def test_streaming_watermark_over_ntz_parquet(spark, ntz_parquet, tmp_path):
    """Watermarked windowed aggregation over a stream read from the no-tz
    parquet (streaming leg of the r02 regression)."""
    schema = load_parquet(spark, ntz_parquet).schema
    src = spark.readStream.schema(schema).parquet(ntz_parquet)
    agg = runner.windowed_event_counts(src, window="1 hour", watermark="10 minutes")
    q = agg.writeStream.queryName("ntz_win").outputMode("complete").format("memory").start()
    q.processAllAvailable()
    q.stop()
    total = spark.sql("SELECT sum(n) AS t FROM ntz_win").collect()[0]["t"]
    assert total == 8


def test_streaming_interval_join_over_ntz_parquet(spark, ntz_parquet, tmp_path):
    """Stream-stream interval join over no-tz parquet inputs."""
    batch = load_parquet(spark, ntz_parquet)
    clicks_dir, buys_dir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    batch.filter(F.col("event_type") == "click").write.parquet(clicks_dir)
    batch.filter(F.col("event_type") == "purchase").write.parquet(buys_dir)
    schema = batch.schema
    out = runner.interval_join(
        spark.readStream.schema(schema).parquet(clicks_dir).select("user_id", "ts"),
        spark.readStream.schema(schema).parquet(buys_dir).select(
            "user_id", F.col("ts").alias("ts2"), "value"
        ),
        key="user_id",
        left_ts="ts",
        right_ts="ts2",
        upper="2 hours",
    )
    q = out.writeStream.queryName("ntz_ij").outputMode("append").format("memory").start()
    q.processAllAvailable()
    q.stop()
    want = runner.interval_join(
        batch.filter(F.col("event_type") == "click").select("user_id", "ts"),
        batch.filter(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("ts2"), "value"),
        key="user_id",
        left_ts="ts",
        right_ts="ts2",
        upper="2 hours",
    ).count()
    got = spark.sql("SELECT count(*) AS n FROM ntz_ij").collect()[0]["n"]
    assert got == want
