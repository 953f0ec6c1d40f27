"""Z-order (Morton) clustering: multi-dimensional file skipping.

Z-ordering linearizes a multi-dimensional key space onto one dimension
such that range-clustered files are simultaneously clustered in EVERY
interleaved dimension.  Parquet min/max row-group stats then skip files
for predicates on any of the dimensions — not just the lead sort column.
``repartitionByRange + sortWithinPartitions`` on the Z-value produces one
tight Z-range per output file.

Like bucketing (functions/bucketing.py — the co-located-join layout
contract), this is a write-side layout choice: it costs one shuffle at
prep time and pays back on every subsequent query — exactly the trade a
100 TB corpus wants (prep once, query thousands of times).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_value(cols: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of each column into one Z-value.

    Callers normalize each dimension into [0, 2^bits) first (modulo a
    bucket count, a rank, or a range bucket) — and should scale every
    dimension to USE the full ``bits`` width: a dimension occupying only
    the low bits contributes nothing to the high interleaved positions, so
    the curve degenerates toward a plain sort on the wider dimensions.
    Bit j of dimension d lands
    at position ``j * len(cols) + d`` — the classic Morton code.  The
    expression is a flat sum of shift/mask terms, all codegen; with D
    dimensions and B bits that's D*B integer ops per row, map-only.
    """
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1)), j * len(cols) + d)
        for j in range(bits)
        for d, c in enumerate(cols)
    ]
    # balanced pairwise reduction keeps the expression tree log-deep
    while len(terms) > 1:
        terms = [terms[i] + terms[i + 1] if i + 1 < len(terms) else terms[i] for i in range(0, len(terms), 2)]
    return terms[0]


def zorder_sql(exprs: list[str], bits: int = 8) -> str:
    """The SAME Morton code as ``zorder_value``, as engine-neutral SQL text
    (generated from one term list so the two cannot drift — the
    _pii_oracle_sql pattern)."""
    terms = [
        # outer parens matter: SQL's << binds looser than +, so an unwrapped
        # "a << 3 + b << 5" would parse as a << (3 + b) << 5
        f"(((({e}) >> {j}) & 1) << {j * len(exprs) + d})"
        for j in range(bits)
        for d, e in enumerate(exprs)
    ]
    return " + ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    path: str,
    bits: int = 8,
    num_files: int = 32,
    dim_buckets: int | None = None,
) -> None:
    """Write ``df`` as parquet range-clustered by the Z-value of ``cols``.

    Each dimension is first bucketed into [0, 2^bits) by modulo
    (``dim_buckets`` defaults to 2^bits); ``repartitionByRange`` over the
    Z-value gives each output file one contiguous Z-range, so parquet
    min/max stats on the ORIGINAL columns are tight per file in every
    dimension — the file-skipping property tests/test_layout.py measures.
    The Z-value itself is dropped before write (layout, not schema).
    """
    buckets = dim_buckets or (1 << bits)
    zv = zorder_value([F.col(c) % buckets for c in cols], bits=bits)
    (
        df.withColumn("_z", zv)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_mb``-sized files, atomically.

    The standard 100 TB maintenance job — streaming sinks and fine-grained
    partition writes accumulate small files, and small files tax every
    subsequent scan (per-file open/footer cost, tiny row groups defeating
    the columnar format, scheduler pressure from 10^6 splits).  Sizing from
    the on-disk byte total (not row counts) keeps the output near the
    parquet sweet spot regardless of schema width.

    With ``sort_cols`` the rewrite uses ``repartitionByRange`` + in-file
    sort, so compaction doubles as re-clustering (tight per-file min/max
    stats — pair with :func:`cluster_by_zorder`'s Z-value for multi-dim).
    Without, a plain ``repartition`` balances bytes evenly.

    Publication is write-to-staging + two directory renames.  Each rename
    is atomic, but the pair is NOT: there is a brief window where ``path``
    does not exist, and a crash between the renames strands the table at
    ``<path>.compact-old`` (recovered automatically on the next call).
    Readers never see a *mix* of old and new files, but they can observe a
    transient missing directory — callers needing stronger isolation should
    compact behind a table-format commit (Delta/Iceberg) instead.  Scope:
    ``os.rename`` semantics require a local / POSIX filesystem; on object
    stores use a manifest-swap layout instead.  NOT concurrency-safe: the
    startup recovery deletes ``<path>.compact-staging``/``.compact-old``,
    so two simultaneous compactions of the same table corrupt each other —
    serialize compaction per table externally (the normal maintenance-job
    discipline).  Returns {files_before, files_after, bytes}.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    staging = path.rstrip("/") + ".compact-staging"
    old = path.rstrip("/") + ".compact-old"
    # Recover from a prior crashed run: a leftover staging dir is garbage
    # (never published); a leftover old dir with no live table is the
    # stranded pre-swap state — restore it before compacting.
    if _os.path.isdir(old) and not _os.path.isdir(path):
        _os.rename(old, path)
    for stale in (staging, old):
        if _os.path.isdir(stale):
            _shutil.rmtree(stale)

    files = [f for f in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)]
    total_bytes = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    # hive-partitioned input MUST be rewritten partitioned, or the layout
    # (and every partition-pruned query) silently degrades to a flat table
    partitioned = any("=" in _os.path.basename(_os.path.dirname(f)) for f in files)
    if partitioned and not partition_by:
        raise ValueError(
            f"{path} is hive-partitioned; pass partition_by=[...] so compaction "
            "preserves the partition layout"
        )
    df = spark.read.parquet(path)
    if partition_by:
        # repartition by the partition columns so each output partition is
        # written by few tasks (avoids the small-files relapse)
        out = df.repartition(n_out, *partition_by)
    elif sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n_out)
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)
    _os.rename(path, old)
    _os.rename(staging, path)
    # keep the .compact-old backup until the swap has fully completed, then
    # drop it; a crash before this line is recovered by the next call
    _shutil.rmtree(old)
    after = len(_glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True))
    return {"files_before": len(files), "files_after": after, "bytes": total_bytes}


def write_with_bloom(
    df: DataFrame,
    path: str,
    bloom_cols: dict[str, int],
    num_files: int | None = None,
) -> None:
    """Write parquet with column bloom filters: ``bloom_cols`` maps column
    name -> expected distinct count (sizes the filter's bit budget).

    The point-lookup complement to Z-order/min-max skipping: needle-in-
    haystack predicates (``doc_key = 'abc...'``) skip row groups whose
    bloom filter excludes the value — min/max stats are useless for
    high-cardinality hash-like keys, which is exactly where blooms shine.
    Caveat (parquet-mr behavior): a column whose values are fully
    dictionary-encoded gets NO bloom filter (the dictionary is already an
    exact membership structure); blooms only materialize on columns that
    overflow dictionary encoding, i.e. the high-cardinality ones that need
    them.  Size cost ~1.2 bytes/ndv per row group at the default FPP.
    """
    w = df.repartition(num_files) if num_files else df
    writer = w.write.mode("overwrite")
    for col, ndv in bloom_cols.items():
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
        writer = writer.option(f"parquet.bloom.filter.expected.ndv#{col}", str(int(ndv)))
    writer.parquet(path)
