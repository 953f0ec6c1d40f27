"""kafka_connect_morphlines_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``epheatt/kafka-connect-morphlines``.

The reference embeds the Kite SDK Morphlines record-at-a-time ETL engine inside
Kafka Connect (see /root/reference/src/main/java/.../MorphlineSinkTask.java:66 and
MorphlineTransform.java:59).  This engine re-expresses that capability surface
Spark-first: a *pipeline* is a declarative spec (HOCON file — the reference's own
config dialect — or a Python dict) compiled to an ordered list of
``DataFrame -> DataFrame`` transforms, executed by Catalyst/Tungsten in batch or
Structured Streaming.  There is no record-at-a-time interpretation anywhere:
every morphline command compiles to native Column expressions so predicate
pushdown, column pruning and whole-stage codegen stay enabled.
"""

from kafka_connect_morphlines_spark.pipeline import Pipeline, branch_by_schema, compile_pipeline
from kafka_connect_morphlines_spark.session import get_spark

__all__ = ["Pipeline", "branch_by_schema", "compile_pipeline", "get_spark"]
__version__ = "0.1.0"
