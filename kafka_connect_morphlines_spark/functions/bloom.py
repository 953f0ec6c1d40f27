"""Bloom-filter incremental dedup: new batch vs an existing corpus snapshot.

The 100 TB problem: each ingest batch must be deduped against billions of
already-ingested keys.  A direct anti-join shuffles the batch against the
full corpus key set every run.  The bloom path builds a compact bitmap over
the corpus keys ONCE (persistable across runs), broadcast-joins the batch
against it, and only the rows the filter *cannot rule out* (true dups +
``fpp`` false positives) reach the exact verify join — the join input
shrinks from |batch| to |dups| + fpp·|batch|.  Final semantics are EXACTLY
the anti-join (the verify step removes false positives), so the operator is
DuckDB-oracle-able.

Representation: the bitmap is a DataFrame of ``(word_idx int, bits long)``
— only *set* words are materialized, so a sparse filter stays sparse.  Probes
broadcast-join on ``word_idx``; a missing word means the bit is 0.  All k
bit positions are computed JVM-side with ``xxhash64`` (seed folded into the
hashed value), so build and probe agree on any executor with zero Python in
the hot path.

Sizing: ``bloom_parameters(n, fpp)`` gives the standard m = -n·ln p/(ln 2)²,
k = (m/n)·ln 2.  At n=1e9, fpp=1%: m ≈ 9.6e9 bits ≈ 1.2 GB ≈ 150M words —
large but broadcastable (Spark torrent broadcast); at fpp=5% it halves.
The words table can also be persisted (parquet) and re-read per batch, which
is the incremental-ingest deployment shape.

The reference repo has no incremental-state operator at all; closest is its
at-most-once offset tracking (SURVEY.md §2 Part A framework rows).  This is
part of the beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from kafka_connect_morphlines_spark.functions import ensure_parallelism


def bloom_parameters(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_keys`` at false-positive rate
    ``fpp``.  m is rounded up to a multiple of 64 (whole words)."""
    n = max(1, n_keys)
    m = -n * math.log(max(min(fpp, 0.5), 1e-12)) / (math.log(2.0) ** 2)
    m_bits = ((int(m) + 63) // 64) * 64
    k = max(1, round(m_bits / n * math.log(2.0)))
    return m_bits, int(k)


def _positions(key: Column, m_bits: int, k: int) -> list[tuple[Column, Column]]:
    """The k (word_idx, bit_in_word) pairs for a key — xxhash64 with the
    probe index folded into the hashed tuple, mod m.  Codegen end-to-end."""
    out = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits))
        out.append(((pos / 64).cast("int"), (pos % 64).cast("int")))
    return out


def bloom_words(df: DataFrame, key: Column, m_bits: int, k: int) -> DataFrame:
    """Build the filter: DataFrame of (word_idx, bits) covering every set
    word.  One explode (k rows per key) + one map-side-combined groupBy —
    shuffle carries at most min(n·k, m/64) (word, partial-OR) longs."""
    pos = _positions(key, m_bits, k)
    contrib = F.array(
        *[
            F.struct(
                w.alias("word_idx"),
                # shiftleft with a *column* bit count (the python wrapper
                # only takes int literals)
                F.call_function("shiftleft", F.lit(1).cast("long"), b).alias("m"),
            )
            for w, b in pos
        ]
    )
    return (
        ensure_parallelism(df)
        .select(F.explode(contrib).alias("c"))
        .groupBy(F.col("c.word_idx").alias("word_idx"))
        .agg(F.bit_or("c.m").alias("bits"))
    )


def probe_bloom(
    df: DataFrame,
    key: Column,
    words: DataFrame,
    m_bits: int,
    k: int,
    maybe_col: str = "_maybe",
) -> DataFrame:
    """Tag every row with ``maybe_col``: False ⇒ key definitely not in the
    filter; True ⇒ key *may* be present (verify required).

    Shape: k-way explode of probe positions, broadcast join on word_idx,
    conjunction re-assembled per row with a bool_and over a row id.  The
    corpus never appears here — only the (small) words table moves.
    """
    pos = _positions(key, m_bits, k)
    probes = F.array(
        *[F.struct(w.alias("word_idx"), b.alias("bit")) for w, b in pos]
    )
    tagged = df.withColumn("_rid", F.monotonically_increasing_id())
    if not tagged.isStreaming:
        # _rid feeds two branches of the plan; pin it so re-execution of the
        # non-deterministic id expression cannot diverge between them (same
        # pattern as the self-join checkpoints in dedup.py)
        tagged = tagged.localCheckpoint()
    exploded = tagged.select("_rid", F.explode(probes).alias("p"))
    # bit_get, not shiftrightunsigned(..)%2: the latter keeps the sign at
    # shift 0, so words with bit 63 set would yield -1 and read as misses
    hit = F.bit_get(F.coalesce(F.col("bits"), F.lit(0).cast("long")), F.col("p.bit")) == 1
    verdict = (
        exploded.join(F.broadcast(words), F.col("p.word_idx") == words["word_idx"], "left")
        .select("_rid", hit.alias("_hit"))
        .groupBy("_rid")
        .agg(F.bool_and("_hit").alias(maybe_col))
    )
    return tagged.join(verdict, "_rid", "inner").drop("_rid")


def semi_join_prefilter(
    big_df: DataFrame,
    big_key: Column,
    dim_df: DataFrame,
    dim_key: Column,
    fpp: float = 0.01,
    n_dim_keys: int | None = None,
    distinct_keys: bool = True,
) -> DataFrame:
    """Rows of ``big_df`` whose key appears in ``dim_df`` — exact
    LEFT SEMI join semantics, bloom-pruned before any shuffle.

    The 100 TB shape this exists for: a selective dimension predicate
    (say 5% of customers) against a fact table too big to shuffle in
    full.  A plain semi join shuffles *every* fact row on the join key;
    here the fact side is first probed against a broadcast bloom of the
    dim keys (map-only), so only matches + ``fpp`` false positives reach
    the exact verify semi join — the shuffle input shrinks from |fact| to
    ~|matches|.  False positives are removed by the verify join, so the
    result is exactly the semi join (DuckDB-oracle-able); bloom filters
    have no false negatives, so no match is ever lost.

    This is the DPP/runtime-filter pattern (Spark's own
    InSubqueryExec/bloom runtime filters do it for literal subqueries);
    expressed as an operator it also composes with non-SQL dim sources.
    """
    keys = dim_df.select(dim_key.alias("_dk"))
    if distinct_keys:
        keys = keys.distinct()
    # The key frame feeds up to three executions (the sizing count, the
    # bloom-words build, the exact verify join) and each re-runs the
    # upstream scan + distinct shuffle — materialize it once.  The frame
    # is exactly the dim keys (the side already assumed shuffle-affordable
    # by the verify join), so the checkpoint is distributed and bounded.
    if not keys.isStreaming:
        keys = keys.localCheckpoint()
    n = n_dim_keys if n_dim_keys is not None else keys.count()
    m_bits, k = bloom_parameters(n, fpp)
    words = bloom_words(keys, F.col("_dk"), m_bits, k)
    probed = probe_bloom(big_df, big_key, words, m_bits, k)
    maybe = probed.filter(F.col("_maybe")).drop("_maybe")
    return maybe.join(keys, big_key == F.col("_dk"), "left_semi")


def incremental_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    new_key: Column,
    corpus_key: Column,
    fpp: float = 0.01,
    n_corpus_keys: int | None = None,
    distinct_keys: bool = True,
) -> DataFrame:
    """Rows of ``new_df`` whose key does not appear in the corpus — exact
    anti-join semantics, bloom-pruned verify join.

    ``n_corpus_keys`` sizes the filter; when omitted it is counted (one
    corpus scan — in an incremental deployment pass the running count).
    Definitely-new rows bypass the verify join entirely; only maybe-rows
    (dups + fpp of the batch) join against the corpus key set.

    ``distinct_keys=False`` skips the distinct shuffle when corpus keys are
    already unique (e.g. a primary key) — the anti-join is dup-insensitive
    and duplicate keys set no new bloom bits, so only the shuffle is saved.
    """
    keys = corpus_df.select(corpus_key.alias("_ck"))
    if distinct_keys:
        keys = keys.distinct()
    # Same single-materialization rule as semi_join_prefilter: the corpus
    # key frame otherwise re-executes its scan + distinct for the sizing
    # count, the words build, and the verify anti-join.
    if not keys.isStreaming:
        keys = keys.localCheckpoint()
    n = n_corpus_keys if n_corpus_keys is not None else keys.count()
    m_bits, k = bloom_parameters(n, fpp)
    words = bloom_words(keys, F.col("_ck"), m_bits, k)
    probed = probe_bloom(new_df, new_key, words, m_bits, k)
    sure_new = probed.filter(~F.col("_maybe")).drop("_maybe")
    maybe = probed.filter(F.col("_maybe")).drop("_maybe")
    verified_new = maybe.join(keys, new_key == F.col("_ck"), "left_anti")
    return sure_new.unionByName(verified_new)
