"""DSIR importance resampling (functions/dsir.py): exact parity with a
pure-Python reference of the hashed-ngram log-likelihood-ratio weights, and
determinism of the Gumbel top-k resample."""

import hashlib
import math

from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import dsir

DIM = 4096


def _bucket(gram: str, seed: str = "dsir") -> int:
    return int(hashlib.md5(f"feat/{seed}/{gram}".encode()).hexdigest()[:6], 16) % DIM


def _features(text: str) -> list[int]:
    toks = [t for t in text.strip().split(" ") if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(g) for g in grams]


def _ref_weights(rows):
    """rows: (doc_id, text, is_target) -> {doc_id: (n_feats, logw_milli)}."""
    feats = {doc_id: _features(text) for doc_id, text, _ in rows}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for doc_id, _, is_tgt in rows:
        for b in feats[doc_id]:
            cr[b] = cr.get(b, 0) + 1
            if is_tgt:
                ct[b] = ct.get(b, 0) + 1
    nr = sum(cr.values())
    nt = sum(ct.values())
    lam = {
        b: math.floor(
            1000
            * (
                math.log(ct.get(b, 0) + 1.0)
                - math.log(nt + float(DIM))
                - math.log(cr[b] + 1.0)
                + math.log(nr + float(DIM))
            )
            + 0.5
        )
        for b in cr
    }
    return {
        doc_id: (len(feats[doc_id]), sum(lam[b] for b in feats[doc_id]))
        for doc_id, _, _ in rows
    }


ROWS = [
    (1, "the quick brown fox jumps over the lazy dog", True),
    (2, "the quick brown fox naps under the old tree", True),
    (3, "der schnelle braune fuchs springt ueber den hund", False),
    (4, "le renard brun rapide saute par dessus le chien", False),
    (5, "the brown dog naps", False),  # raw doc with target-like vocab
    (6, "", False),  # empty text -> 0 features, weight 0
]


def test_importance_weights_match_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "doc_id int, text string"
    ).withColumn("is_en", F.col("doc_id") <= 2)
    out = {
        r["doc_id"]: (r["n_feats"], r["logw_milli"])
        for r in dsir.importance_weights(df, F.col("is_en"), dim=DIM).collect()
    }
    assert out == _ref_weights(ROWS)


def test_target_like_docs_weigh_higher(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS if t], "doc_id int, text string"
    ).withColumn("is_en", F.col("doc_id") <= 2)
    w = {
        r["doc_id"]: r["logw_milli"] / max(r["n_feats"], 1)
        for r in dsir.importance_weights(df, F.col("is_en"), dim=DIM).collect()
    }
    # the target-vocabulary raw doc outranks both off-domain docs
    assert w[5] > w[3] and w[5] > w[4]
    # and the target docs themselves score highest
    assert min(w[1], w[2]) > max(w[3], w[4])


def test_gumbel_topk_deterministic_and_weight_biased(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id int, text string"
    )
    # synthetic weights: docs 0-9 heavy (+5000 milli), rest 0
    w = df.select(
        "doc_id",
        F.when(F.col("doc_id") < 10, F.lit(5000)).otherwise(F.lit(0)).cast("long").alias("logw_milli"),
    )
    got = dsir.gumbel_topk(w, k=20).collect()
    assert len(got) == 20
    again = dsir.gumbel_topk(w, k=20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]
    # exp(5) ~ 148x upweight: essentially all heavy docs make the top-20
    heavy = sum(1 for r in got if r["doc_id"] < 10)
    assert heavy >= 9
