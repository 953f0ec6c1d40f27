"""File-source/sink contracts that matter at warehouse scale: schema
evolution across parquet files and dynamic partition overwrite."""

from pyspark.sql import functions as F


def test_merge_schema_reads_evolved_directory(spark, tmp_path):
    """A column added mid-stream must not break the reader: mergeSchema
    unions the per-file schemas (old files null-fill the new column) —
    the contract that lets a 100 TB table evolve without rewrite."""
    path = str(tmp_path / "evolving")
    spark.range(10).select("id").write.parquet(path)
    spark.range(10, 20).select("id", (F.col("id") * 2).alias("extra")).write.mode(
        "append"
    ).parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "extra"}
    rows = {r["id"]: r["extra"] for r in df.collect()}
    assert len(rows) == 20
    assert rows[5] is None and rows[15] == 30


def test_dynamic_partition_overwrite_replaces_only_touched(spark, tmp_path):
    """partitionOverwriteMode=dynamic: an overwrite write replaces only the
    partitions present in the incoming frame — the idempotent-backfill
    primitive (re-running one day never truncates the rest of the table)."""
    path = str(tmp_path / "parts")
    base = spark.range(100).select("id", (F.col("id") % 4).alias("day"))
    base.write.partitionBy("day").parquet(path)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fix = spark.range(1000, 1010).select("id", F.lit(2).alias("day"))
        fix.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    back = spark.read.parquet(path)
    assert back.filter(F.col("day") == 2).count() == 10       # replaced
    assert back.filter(F.col("day") != 2).count() == 75       # untouched
    assert back.filter(F.col("id") >= 1000).count() == 10
