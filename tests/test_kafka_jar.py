"""Jar-present Kafka path: compile-and-plan smoke for the REAL connector.

The engine's read_kafka_batch/stream and write_kafka_batch
(sources/kafka.py) are exercised everywhere through the jar-less embedded
loopback broker; the jar-present code path (format "kafka", the
reference's actual transport — MorphlineSinkTask.java:129-149) was only
covered by error-path tests.  This module plan-tests it for real wherever
the spark-sql-kafka package IS on the classpath, and auto-skips (marker
``kafka_jar``) where it is not — no broker is needed because Spark's kafka
source resolves the data source and validates options at plan time and
only connects at execution.
"""

from __future__ import annotations

import pytest

from kafka_connect_morphlines_spark import record as R
from kafka_connect_morphlines_spark.sources import kafka as K


def _jar_present(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", "localhost:1"
        ).option("subscribe", "probe").load()
        return True
    except Exception as e:
        return "kafka" not in str(e).lower() and "data source" not in str(e).lower()


@pytest.mark.kafka_jar
def test_jar_kafka_batch_and_stream_plan(spark):
    if K.KAFKA_FORMAT != "kafka" or not _jar_present(spark):
        pytest.skip("spark-sql-kafka jar not on the classpath")
    env = K.read_kafka_batch(spark, "localhost:1", "t1,t2")
    # canonical envelope schema, straight from the real connector's plan
    for col in (R.TOPIC, R.KAFKA_PARTITION, R.KAFKA_OFFSET, R.KEY, R.VALUE, R.TIMESTAMP):
        assert col in env.columns, env.columns
    assert not env.isStreaming

    stream = K.read_kafka_stream(spark, "localhost:1", "t1")
    assert stream.isStreaming
    assert set(env.columns) == set(stream.columns)


def test_jarless_paths_raise_kafka_unavailable(spark):
    """The inverse gate: without the jar (this sandbox), the real-connector
    entry points must fail with the actionable KafkaUnavailableError, not
    an opaque AnalysisException."""
    if K.KAFKA_FORMAT != "kafka" or _jar_present(spark):
        pytest.skip("spark-sql-kafka jar IS present; the error path is moot")
    with pytest.raises(K.KafkaUnavailableError):
        K.read_kafka_batch(spark, "localhost:1", "t")
    with pytest.raises(K.KafkaUnavailableError):
        K.read_kafka_stream(spark, "localhost:1", "t")
