"""Retrieval (inverted index / BM25) and temporal (SCD2 / point-in-time)
operator tests on tiny hand-checkable frames, plus the bigram LM scorer.

Mirrors the reference's golden style (exact expected values from fixtures,
MorphlineTransformTest.java:142-301) for operators the reference itself
delegates to Solr (loadSolr) or lacks entirely.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import retrieval, temporal, textstats


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark window spark"),
        (2, "vector window"),
        (3, "spark"),
        (4, ""),
        (5, "join merge join"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_stats(corpus):
    stats = {r["term"]: r.asDict() for r in retrieval.index_stats(corpus).collect()}
    assert stats["spark"]["df"] == 2
    assert stats["spark"]["ctf"] == 3
    assert stats["spark"]["min_doc"] == 1 and stats["spark"]["max_doc"] == 3
    assert stats["window"]["df"] == 2 and stats["window"]["ctf"] == 2
    assert "" not in stats  # empty doc contributes no terms


def test_inverted_postings_band_filter(corpus):
    # min_df=2 keeps only terms appearing in >= 2 docs
    out = {r["term"]: r for r in retrieval.inverted_postings(corpus, min_df=2).collect()}
    assert set(out) == {"spark", "window"}
    assert out["spark"]["postings"] == [1, 3]
    assert out["window"]["postings"] == [1, 2]
    # max_df band excludes the frequent term
    out2 = {r["term"] for r in retrieval.inverted_postings(corpus, min_df=1, max_df=1).collect()}
    assert "spark" not in out2 and "vector" in out2


def test_bm25_ranking_and_values(corpus):
    got = retrieval.bm25_topk(corpus, ["spark"], k=3).collect()
    # docs 1 (tf=2, dl=3) and 3 (tf=1, dl=1) match
    assert [r["doc_id"] for r in got] == [1, 3] or [r["doc_id"] for r in got] == [3, 1]
    by_id = {r["doc_id"]: r for r in got}
    n_docs, avgdl = 5, (3 + 2 + 1 + 0 + 3) / 5.0
    idf = math.log(1.0 + (n_docs - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        return round(
            round(idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)), 6), 4
        )

    assert by_id[1]["score"] == pytest.approx(score(2, 3), abs=1e-4)
    assert by_id[3]["score"] == pytest.approx(score(1, 1), abs=1e-4)
    assert by_id[1]["n_terms_matched"] == 1


def test_bm25_deterministic_tiebreak(corpus):
    # both matching docs for "window" have tf=1; ranking must tie-break by id
    got = retrieval.bm25_topk(corpus, ["window"], k=2).collect()
    assert len(got) == 2
    if got[0]["score"] == got[1]["score"]:
        assert got[0]["doc_id"] < got[1]["doc_id"]


def test_bigram_logprob_small(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.bigram_logprob_df(df).collect()}
    # corpus bigrams: (a,b)x2, (b,a)x1; unigrams: a:3, b:2; V=2
    lp_ab = math.log((2 + 1.0) / (3 + 2.0))
    lp_ba = math.log((1 + 1.0) / (2 + 2.0))
    want = round((2 * lp_ab + lp_ba) / 3, 6)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["logprob"] == pytest.approx(want, abs=1e-6)
    # sub-bigram-length and null docs keep rows with zeros
    assert out[2]["n_bigrams"] == 0 and out[2]["logprob"] == 0.0
    assert out[3]["n_bigrams"] == 0


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        (10, "2024-01-01", "bronze"),
        (10, "2024-02-01", "silver"),
        (10, "2024-03-01", "gold"),
        (20, "2024-01-15", "bronze"),
    ]
    return spark.createDataFrame(rows, "cust long, ts string, tier string").select(
        "cust", F.to_date("ts").alias("ts"), "tier"
    )


def test_scd2_versions_chain(changes):
    v = temporal.scd2_versions(changes, "cust", "ts", ["tier"])
    rows = sorted(v.collect(), key=lambda r: (r["cust"], r["version"]))
    c10 = [r for r in rows if r["cust"] == 10]
    assert [r["version"] for r in c10] == [1, 2, 3]
    # contiguous: each valid_to equals the next valid_from; last is open
    assert c10[0]["valid_to"] == c10[1]["valid_from"]
    assert c10[1]["valid_to"] == c10[2]["valid_from"]
    assert c10[2]["valid_to"] is None and c10[2]["is_current"]
    assert not c10[0]["is_current"]
    c20 = [r for r in rows if r["cust"] == 20]
    assert len(c20) == 1 and c20[0]["is_current"] and c20[0]["version"] == 1


def test_point_in_time_join(spark, changes):
    v = temporal.scd2_versions(changes, "cust", "ts", ["tier"])
    facts = spark.createDataFrame(
        [
            (1, 10, "2024-01-20"),  # inside v1
            (2, 10, "2024-02-01"),  # boundary: picks the version starting that day
            (3, 10, "2024-12-01"),  # current version
            (4, 20, "2024-01-01"),  # before any version -> null
        ],
        "fact_id long, cust long, ts string",
    ).select("fact_id", "cust", F.to_date("ts").alias("ts"))
    out = temporal.point_in_time_join(
        facts, v.select("cust", "valid_from", "tier"), key="cust", fact_ts="ts", value_cols=["tier"]
    )
    got = {r["fact_id"]: r["tier_asof"] for r in out.collect()}
    assert got == {1: "bronze", 2: "silver", 3: "gold", 4: None}


def test_point_in_time_enforce_valid_to(spark, changes):
    # close customer 20's only version at 2024-06-01 (hard delete, no successor)
    v = temporal.scd2_versions(changes, "cust", "ts", ["tier"]).withColumn(
        "valid_to",
        F.when(F.col("cust") == 20, F.to_date(F.lit("2024-06-01"))).otherwise(F.col("valid_to")),
    )
    facts = spark.createDataFrame(
        [(1, 20, "2024-03-01"), (2, 20, "2024-07-01")], "fact_id long, cust long, ts string"
    ).select("fact_id", "cust", F.to_date("ts").alias("ts"))
    out = temporal.point_in_time_join(
        facts,
        v.select("cust", "valid_from", "valid_to", "tier"),
        key="cust",
        fact_ts="ts",
        value_cols=["valid_to", "tier"],
        enforce_valid_to=True,
    )
    got = {r["fact_id"]: r["tier_asof"] for r in out.collect()}
    assert got[1] == "bronze"  # inside validity
    assert got[2] is None  # after the close -> no state


def test_minhash_cross_dupes(spark):
    from kafka_connect_morphlines_spark.functions import dedup

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [
            (1, base),                                  # exact copy of ref 100
            (2, base + " extra"),                       # near copy
            (3, "totally different words here now ok"), # unrelated
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {
        (r["doc_id"], r["ref_id"]): r["jacc"]
        for r in dedup.minhash_cross_dupes(corpus, ref, threshold=0.5).collect()
    }
    assert got[(1, 100)] == 1.0
    assert 0.5 <= got[(2, 100)] < 1.0
    assert (3, 100) not in got
