"""Product quantization (PQ) for embedding compression + ADC search.

Jégou et al. 2011 ("Product Quantization for Nearest Neighbor Search"):
split each d-dim vector into m subvectors, k-means each subspace into
k_codes centroids, store each vector as m small code ids.  At 64-dim /
m=8 / k=16 that is 64 floats → 8 nibble codes: 32× compression, and
asymmetric-distance (ADC) search scans codes against a per-query lookup
table without ever touching the original vectors.

Scale design (100 TB):
- codebook fit runs the same DataFrame-native Lloyd loop as
  semantic.kmeans_fit, once per subspace over SLICED vectors (slice is a
  codegen expression; the corpus is scanned per subspace but only
  k×(d/m+1) numbers ever reach the driver);
- encoding is one Arrow-batched pandas UDF: m argmin matmuls per batch;
- ADC search precomputes the m×k LUT from the query on the driver
  (closure-broadcast), then scoring is a numpy LUT-gather over the code
  arrays — map-only scan + TakeOrdered, the same distributed shape as
  brute_force_topk but over 32× less data.

The reference repo has no vector operators; PQ joins LSH/IVF in the
beyond-reference ANN family (SURVEY.md Part C).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from kafka_connect_morphlines_spark.functions import ensure_parallelism
from kafka_connect_morphlines_spark.functions.semantic import kmeans_fit


def pq_fit(
    df: DataFrame,
    m_subspaces: int = 8,
    k_codes: int = 16,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 0,
) -> list[list[list[float]]]:
    """Fit per-subspace codebooks: ``codebooks[s][c]`` is the c-th centroid
    of subspace s (each of length d/m).  Deterministic for fixed params.

    One Lloyd fit per subspace over ``slice(vec, ...)`` — the slice is a
    codegen projection, so each fit scans (id, d/m floats), not the full
    vector.
    """
    probe = df.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    d = int(probe[0]["d"]) if probe else 0
    if d == 0 or d % m_subspaces != 0:
        raise ValueError(f"dim {d} not divisible by m_subspaces={m_subspaces}")
    sub = d // m_subspaces
    books: list[list[list[float]]] = []
    for s in range(m_subspaces):
        sliced = df.select(
            F.col(id_col), F.slice(F.col(vec_col), s * sub + 1, sub).alias(vec_col)
        )
        cents = kmeans_fit(
            sliced, k=k_codes, n_iter=n_iter, vec_col=vec_col, id_col=id_col, seed=seed * 1000 + s
        )
        books.append([vec for _, vec in cents])
    return books


def _book_array(codebooks: list[list[list[float]]]) -> np.ndarray:
    return np.array(codebooks, dtype=np.float64)  # (m, k, sub)


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``codes`` (array<int>, length m): per-subspace nearest-centroid
    ids by L2.  One Arrow batch pass, m small argmin matmuls per batch."""
    books = _book_array(codebooks)  # (m, k, sub)
    m, _, sub = books.shape

    @F.pandas_udf("array<int>")
    def encode(series: pd.Series) -> pd.Series:
        if series.empty:
            return pd.Series([], dtype="object")
        v = np.stack(series.to_numpy()).astype(np.float64)  # (n, d)
        out = np.empty((len(v), m), dtype=np.int32)
        for s in range(m):
            x = v[:, s * sub : (s + 1) * sub]  # (n, sub)
            # ||x - c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
            cb = books[s]  # (k, sub)
            d2 = -2.0 * (x @ cb.T) + (cb * cb).sum(axis=1)[None, :]
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return df.withColumn("codes", encode(F.col(vec_col)))


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Approximate top-k by ADC: score = Σ_s LUT[s, code_s] where LUT holds
    the query-to-centroid dot products per subspace (cosine-style scoring
    against the PQ reconstruction).  Map-only scan over codes +
    TakeOrdered; the original vectors are never read."""
    books = _book_array(codebooks)  # (m, k, sub)
    m, _, sub = books.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    if qn > 0:
        q = q / qn
    lut = np.einsum("mks,ms->mk", books, q.reshape(m, sub))  # (m, k)

    @F.pandas_udf("double")
    def adc(series: pd.Series) -> pd.Series:
        if series.empty:
            return pd.Series([], dtype="float64")
        c = np.stack(series.to_numpy()).astype(np.int64)  # (n, m)
        return pd.Series(lut[np.arange(m)[None, :], c].sum(axis=1))

    scored = ensure_parallelism(codes_df).select(
        F.col(id_col), adc(F.col(codes_col)).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


# --------------------------------------------------------------------------
# Engine-portable PQ variant: sample-initialized codebooks + fixed-point
# arithmetic.  Codebooks are the k seed vectors with smallest md5(id) (the
# md5-order deterministic sample, standard PQ/OPQ practice of training on
# a bounded sample taken to its k-means-free limit), and every vector is
# quantized ``floor(x * scale + 0.5)`` so distances/scores are EXACT
# integer sums — argmin and ranking are reproducible bit-for-bit by a SQL
# oracle (and across cluster sizes / BLAS builds).  The float pq_fit
# (Lloyd) path above stays the production default; this variant certifies
# the encode/ADC machinery itself.
# --------------------------------------------------------------------------


def pq_fit_sample(
    df: DataFrame,
    m_subspaces: int = 8,
    k_codes: int = 16,
    scale: int = 1024,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[int]]]:
    """Integer codebooks from the ``k_codes`` md5-order seed vectors:
    ``books[s][c]`` = quantized subvector s of seed c.  Only k rows reach
    the driver."""
    import math

    seeds = (
        df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_r", F.md5(F.col("_id").cast("string")))
        .orderBy("_r", "_id")
        .limit(k_codes)
        .collect()
    )
    d = len(seeds[0]["_v"])
    if d % m_subspaces != 0:
        raise ValueError(f"dim {d} not divisible by m_subspaces={m_subspaces}")
    sub = d // m_subspaces
    books = []
    for s in range(m_subspaces):
        books.append(
            [
                [int(math.floor(float(r["_v"][s * sub + j]) * scale + 0.5)) for j in range(sub)]
                for r in seeds
            ]
        )
    return books


def pq_encode_int(
    df: DataFrame,
    codebooks: list[list[list[int]]],
    scale: int = 1024,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-integer PQ encode: quantize, then per-subspace argmin of the
    integer L2 distance (ties -> smallest code id).  Same Arrow-batched
    map-only shape as pq_encode."""
    books = np.asarray(codebooks, dtype=np.int64)  # (m, k, sub)
    m, _, sub = books.shape

    @F.pandas_udf("array<int>")
    def encode(series: pd.Series) -> pd.Series:
        if series.empty:
            return pd.Series([], dtype="object")
        v = np.stack(series.to_numpy()).astype(np.float64)
        xq = np.floor(v * scale + 0.5).astype(np.int64)  # (n, d)
        out = np.empty((len(v), m), dtype=np.int32)
        for s in range(m):
            x = xq[:, s * sub : (s + 1) * sub]  # (n, sub)
            diff = x[:, None, :] - books[s][None, :, :]  # (n, k, sub)
            d2 = (diff * diff).sum(axis=2)
            out[:, s] = d2.argmin(axis=1)  # first min = smallest code id
        return pd.Series(list(out))

    return df.withColumn("codes", encode(F.col(vec_col)))


def pq_topk_int(
    codes_df: DataFrame,
    codebooks: list[list[list[int]]],
    query_vec: list[float],
    k: int = 10,
    scale: int = 1024,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """ADC top-k in the fixed-point domain: integer LUT gather + exact
    integer sum, descaled once at the end (score = idot / scale² — a
    power-of-two division, exact in doubles).  Ranking is therefore
    partition-order independent AND oracle-reproducible."""
    import math

    books = np.asarray(codebooks, dtype=np.int64)  # (m, k, sub)
    m, _, sub = books.shape
    qq = np.array(
        [int(math.floor(float(x) * scale + 0.5)) for x in query_vec], dtype=np.int64
    ).reshape(m, sub)
    lut = np.einsum("mks,ms->mk", books, qq)  # (m, k) integer dot products

    @F.pandas_udf("long")
    def adc(series: pd.Series) -> pd.Series:
        if series.empty:
            return pd.Series([], dtype="int64")
        c = np.stack(series.to_numpy()).astype(np.int64)
        return pd.Series(lut[np.arange(m)[None, :], c].sum(axis=1))

    scored = ensure_parallelism(codes_df).select(
        F.col(id_col), (adc(F.col(codes_col)).cast("double") / F.lit(float(scale * scale))).alias("score")
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
