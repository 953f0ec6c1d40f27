"""Round-5 operators: RRF hybrid fusion, KS drift, chi-square feature
selection, ROUGE-L pair scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_morphlines_spark.functions import evalmetrics, retrieval, validation


def test_rrf_fuse_ranks_and_scores(spark):
    # list A ranks: x(1), y(2); list B ranks: y(1), z(2)
    a = spark.createDataFrame([("x", 0.9), ("y", 0.5)], "doc_id string, score double")
    b = spark.createDataFrame([("y", 0.8), ("z", 0.7)], "doc_id string, score double")
    out = retrieval.rrf_fuse({"a": a, "b": b}, id_col="doc_id", k_const=60, k=10)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows["y"]["rank_a"] == 2 and rows["y"]["rank_b"] == 1
    assert rows["y"]["rrf_score"] == round(1 / 62 + 1 / 61, 6)
    # x only in list a, z only in list b — missing rank contributes 0
    assert rows["x"]["rank_b"] is None
    assert rows["x"]["rrf_score"] == round(1 / 61, 6)
    assert rows["z"]["rrf_score"] == round(1 / 62, 6)
    # y leads: two contributions beat any single one here
    assert out.collect()[0]["doc_id"] == "y"


def test_rrf_fuse_tie_break_deterministic(spark):
    a = spark.createDataFrame([(1, 0.5), (2, 0.5)], "doc_id int, score double")
    out = retrieval.rrf_fuse({"only": a}, id_col="doc_id", k=2).collect()
    # equal scores: rank by id ascending
    assert [r["doc_id"] for r in out] == [1, 2]
    assert [r["rank_only"] for r in out] == [1, 2]


def test_ks_drift_exact_small(spark):
    # a: {1,2,3,4}, b: {3,4,5,6} -> D = 2/4 = 0.5 at x=2
    rows = [("a", float(v)) for v in [1, 2, 3, 4]] + [("b", float(v)) for v in [3, 4, 5, 6]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = validation.ks_drift(df, F.col("v"), F.col("g"), "a", "b").collect()[0]
    assert (out["n_a"], out["n_b"]) == (4, 4)
    assert out["d_num"] == 8  # |2*4 - 0*4| at v=2
    assert out["d_den"] == 16
    assert out["ks_d"] == 0.5


def test_ks_drift_identical_distributions_zero(spark):
    rows = [(g, float(v)) for g in ("a", "b") for v in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = validation.ks_drift(df, F.col("v"), F.col("g"), "a", "b").collect()[0]
    assert out["d_num"] == 0 and out["ks_d"] == 0.0


def test_chi2_tokens_perfectly_discriminative(spark):
    # 'aa' appears only in class x docs, 'bb' only in y; 'cc' in all.
    rows = [(f"aa cc w{i}", "x") for i in range(6)] + [
        (f"bb cc w{i}", "y") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "text string, lang string")
    out = evalmetrics.chi2_tokens(df, F.col("text"), F.col("lang"), min_df=5, topk=2)
    got = {(r["cls"], r["token"]): r for r in out.collect()}
    # perfect association: chi2 = N = 12 for aa|x ; cc is filtered (df = N)
    assert got[("x", "aa")]["chi2"] == 12.0
    assert got[("y", "bb")]["chi2"] == 12.0
    assert ("x", "cc") not in got and ("y", "cc") not in got
    # contingency columns are exact
    assert got[("x", "aa")]["a"] == 6 and got[("x", "aa")]["df_t"] == 6
    assert got[("x", "aa")]["n_c"] == 6


def test_rouge_l_matches_reference_and_handles_empty(spark):
    pairs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat", "the cat lay on the mat"),
            (2, "a b c", "x y z"),
            (3, "", "a b"),
        ],
        "pid int, text_a string, text_b string",
    )
    out = {r["pid"]: r for r in evalmetrics.rouge_l(pairs).collect()}
    # LCS("the cat sat on the mat", "the cat lay on the mat") = 5
    lcs, p, r, f = evalmetrics.rouge_l_py(
        "the cat sat on the mat".split(), "the cat lay on the mat".split()
    )
    assert lcs == 5 and out[1]["lcs_len"] == 5
    assert out[1]["rouge_p"] == p and out[1]["rouge_r"] == r and out[1]["rouge_f"] == f
    assert out[2]["lcs_len"] == 0 and out[2]["rouge_f"] == 0.0
    assert out[3]["lcs_len"] == 0 and out[3]["rouge_f"] is None


def test_rouge_l_symmetric_f(spark):
    pairs = spark.createDataFrame(
        [(1, "a b c d", "b c"), (2, "b c", "a b c d")],
        "pid int, text_a string, text_b string",
    )
    rows = {r["pid"]: r for r in evalmetrics.rouge_l(pairs).collect()}
    assert rows[1]["rouge_f"] == rows[2]["rouge_f"]  # F is symmetric
    assert rows[1]["rouge_p"] == rows[2]["rouge_r"]  # P/R swap


def test_collocations_pmi_counts_and_order(spark):
    from kafka_connect_morphlines_spark.functions import textstats
    import math

    # "a b" appears 6x; "a c" 6x; unigrams balanced
    rows = [("a b x y",)] * 6 + [("a c x z",)] * 6
    df = spark.createDataFrame(rows, "text string").withColumn(
        "doc_id", F.monotonically_increasing_id()
    )
    out = textstats.collocations_pmi_df(df, min_count=5, topk=10).collect()
    got = {(r["w1"], r["w2"]): r for r in out}
    ab = got[("a", "b")]
    # margins: c1(a)=12, c2(b)=6, c12=6, N=36 -> PMI = ln(6*36/(12*6))
    assert (ab["c12"], ab["c1"], ab["c2"]) == (6, 12, 6)
    assert ab["pmi"] == round(math.log(6 * 36 / (12 * 6)), 6)
    # hapax pairs pruned by min_count
    assert all(r["c12"] >= 5 for r in out)
    # deterministic order: pmi desc then lexicographic
    keys = [(r["pmi"], r["w1"], r["w2"]) for r in out]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))


def test_trimmed_stats_drops_tails(spark):
    from kafka_connect_morphlines_spark.functions import validation

    # one group: 0..100; p05=5, p95=95 -> keep 5..95 inclusive, mean 50
    rows = [("g", float(v)) for v in range(101)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    out = validation.trimmed_stats(df, "event_type", "value").collect()[0]
    assert out["n_total"] == 101
    assert out["lo"] == 5.0 and out["hi"] == 95.0
    assert out["n_kept"] == 91
    assert out["trimmed_mean"] == 50.0


def test_trimmed_stats_outlier_immune(spark):
    from kafka_connect_morphlines_spark.functions import validation

    base = [("g", 10.0)] * 98 + [("g", 1e9), ("g", -1e9)]
    df = spark.createDataFrame(base, "event_type string, value double")
    out = validation.trimmed_stats(df, "event_type", "value").collect()[0]
    assert out["trimmed_mean"] == 10.0  # the plain mean would be ~0 +- 1e7


def test_icws_estimates_weighted_jaccard(spark):
    from kafka_connect_morphlines_spark.functions import dedup

    # doc 1 repeats 'x' heavily; doc 2 shares tokens but different weights
    t1 = "x x x x x x y z"
    t2 = "x x y y z w"
    df = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    sig = {r["doc_id"]: r["sig"] for r in dedup.icws_signatures(df, num_hashes=64).collect()}
    est = sum(1 for a, b in zip(sig[1], sig[2]) if a == b) / 64
    tf1 = {"x": 6, "y": 1, "z": 1}
    tf2 = {"x": 2, "y": 2, "z": 1, "w": 1}
    true = dedup.weighted_jaccard_exact(tf1, tf2)  # 4/10 = 0.4
    assert abs(est - true) < 0.2  # 64 hashes: binomial std ~0.06
    # identical doc -> identical signature (J_w = 1)
    df2 = spark.createDataFrame([(1, t1), (3, t1)], "doc_id long, text string")
    sig2 = {r["doc_id"]: r["sig"] for r in dedup.icws_signatures(df2, num_hashes=16).collect()}
    assert sig2[1] == sig2[3]


def test_icws_deterministic_across_runs(spark):
    from kafka_connect_morphlines_spark.functions import dedup

    df = spark.createDataFrame([(1, "a a b c"), (2, "b c d")], "doc_id long, text string")
    s1 = sorted(map(tuple, [(r["doc_id"], tuple(r["sig"])) for r in dedup.icws_signatures(df).collect()]))
    s2 = sorted(map(tuple, [(r["doc_id"], tuple(r["sig"])) for r in dedup.icws_signatures(df).collect()]))
    assert s1 == s2


def test_icws_near_dupes_finds_weighted_pair(spark):
    from kafka_connect_morphlines_spark.functions import dedup

    rows = [
        (1, "alpha alpha alpha beta gamma delta"),
        (2, "alpha alpha alpha beta gamma delta"),  # exact dup of 1
        (3, "zeta eta theta iota kappa"),            # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.icws_near_dupes(df, num_hashes=16, min_agree=12).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["agree"] == 16


def test_control_char_stats(spark):
    from kafka_connect_morphlines_spark.functions import textstats

    rows = [
        (1, "clean text"),
        (2, "bad\x00\x01stuff"),          # 2 control chars
        (3, "tab\tand\nnewline\rok"),     # whitelisted controls
        (4, "repl�char"),            # U+FFFD only
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textstats.control_char_stats_df(df).collect()}
    assert got[1]["n_control"] == 0 and got[1]["control_ratio"] == 0.0
    assert got[2]["n_control"] == 2
    assert got[2]["control_ratio"] == round(2 / len("bad\x00\x01stuff"), 6)
    assert got[3]["n_control"] == 0  # \t \n \r excluded
    assert got[4]["n_replacement"] == 1 and got[4]["n_control"] == 0
    assert got[5]["n_chars"] == 0 and got[5]["control_ratio"] == 0.0


def test_compression_ratio_signal_direction(spark):
    from kafka_connect_morphlines_spark.functions import textclean
    import zlib

    rep = "spam " * 200           # highly compressible
    var = " ".join(f"w{i}x{i*7%97}" for i in range(200))  # high entropy
    df = spark.createDataFrame(
        [(1, rep), (2, var), (3, "")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in textclean.compression_ratio(df).collect()}
    assert got[1]["ratio"] < got[2]["ratio"]  # repetitive compresses better
    # exact value pinned against local zlib at the same level
    raw = rep.encode("utf-8")
    assert got[1]["n_bytes"] == len(raw)
    assert got[1]["n_compressed"] == len(zlib.compress(raw, 6))
    assert got[3]["ratio"] is None and got[3]["n_bytes"] == 0


def test_phrase_scan_exact_substring_counts(spark):
    from kafka_connect_morphlines_spark.functions import traindata

    rows = [
        (1, "foo bar foo bar foo"),
        (2, "nothing here"),
        (3, "foobar"),  # substring match without token boundary
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["phrase"]: r for r in traindata.phrase_scan(df, ["foo", "bar foo"]).collect()}
    assert out["foo"]["n_docs"] == 2          # docs 1 and 3
    assert out["foo"]["n_occurrences"] == 4   # 3 in doc 1 + 1 in doc 3
    assert out["bar foo"]["n_occurrences"] == 2
    # empty phrase rejected
    import pytest as _pytest
    with _pytest.raises(ValueError):
        traindata.phrase_scan(df, ["ok", ""])


def test_ndcg_perfect_and_inverted_rankings(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics
    import math

    # q1: scores perfectly ordered by relevance -> ndcg 1.0
    # q2: scores inverted -> ndcg < 1, computable by hand
    rows = [
        ("q1", 3.0, 2, 1), ("q1", 2.0, 1, 2), ("q1", 1.0, 0, 3),
        ("q2", 1.0, 2, 4), ("q2", 2.0, 1, 5), ("q2", 3.0, 0, 6),
    ]
    df = spark.createDataFrame(rows, "q string, s double, rel int, eid int")
    out = {r["q"]: r for r in evalmetrics.ndcg_at_k(
        df, "q", F.col("s"), F.col("rel"), k=10, tiebreak=F.col("eid")
    ).collect()}
    assert out["q1"]["ndcg"] == 1.0
    dcg = round(0 / 1.0, 6) + round(1 / (math.log(3) / math.log(2)), 6) + round(3 / (math.log(4) / math.log(2)), 6)
    idcg = round(3 / 1.0, 6) + round(1 / (math.log(3) / math.log(2)), 6)
    assert out["q2"]["ndcg"] == round(round(dcg, 6) / round(idcg, 6), 6)


def test_ndcg_no_relevant_items_null(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    df = spark.createDataFrame(
        [("q", 1.0, 0, 1), ("q", 2.0, 0, 2)], "q string, s double, rel int, eid int"
    )
    row = evalmetrics.ndcg_at_k(df, "q", F.col("s"), F.col("rel"), tiebreak=F.col("eid")).collect()[0]
    assert row["dcg"] == 0.0 and row["ndcg"] is None


def test_gini_extremes(spark):
    from kafka_connect_morphlines_spark.functions import validation

    # perfectly equal -> 0; one holder of all mass among n -> (n-1)/n
    rows = [("eq", 5.0)] * 10 + [("uneq", 0.0)] * 9 + [("uneq", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in validation.gini_by_group(df, "g", "v").collect()}
    assert out["eq"]["gini"] == 0.0
    assert out["uneq"]["gini"] == 0.9  # (n-1)/n with n=10
    assert out["uneq"]["mean"] == 10.0


def test_map_at_k_hand_computed(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    # ranking by score desc: rel pattern [1, 0, 1, 0] ->
    # AP = (1/1 + 2/3) / 2
    rows = [
        ("q", 4.0, 1, 1), ("q", 3.0, 0, 2), ("q", 2.0, 1, 3), ("q", 1.0, 0, 4),
        ("empty", 9.0, 0, 5),
    ]
    df = spark.createDataFrame(rows, "q string, s double, rel int, eid int")
    out = {r["q"]: r for r in evalmetrics.map_at_k(
        df, "q", F.col("s"), F.col("rel"), k=10, tiebreak=F.col("eid")
    ).collect()}
    assert out["q"]["n_relevant"] == 2
    # (1/1 + 2/3)/2 = 0.8333335 -> 0.833334 under Spark's HALF_UP round
    # (Python's round() banker's-rounds the same float to 0.833333; the
    # oracle gate only needs Spark==DuckDB, which the certify run pins)
    assert abs(out["q"]["ap"] - (1 + 2 / 3) / 2) < 1e-6
    assert out["empty"]["ap"] is None


def test_map_at_k_perfect_ranking_is_one(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    rows = [("q", 3.0, 1, 1), ("q", 2.0, 1, 2), ("q", 1.0, 0, 3)]
    df = spark.createDataFrame(rows, "q string, s double, rel int, eid int")
    row = evalmetrics.map_at_k(df, "q", F.col("s"), F.col("rel"), tiebreak=F.col("eid")).collect()[0]
    assert row["ap"] == 1.0


def test_bootstrap_ci_brackets_mean_and_shrinks(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    small = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(100)], "event_id long, value double"
    )
    big = spark.createDataFrame(
        [(i, float(i % 10)) for i in range(2000)], "event_id long, value double"
    )
    rs = evalmetrics.bootstrap_mean_ci(small, F.col("value"), F.col("event_id")).collect()[0]
    rb = evalmetrics.bootstrap_mean_ci(big, F.col("value"), F.col("event_id")).collect()[0]
    assert rs["mean"] == 4.5 and rb["mean"] == 4.5
    assert rs["boot_lo"] < 4.5 < rs["boot_hi"]
    assert rb["boot_lo"] < 4.5 < rb["boot_hi"]
    # 20x the data -> materially tighter interval
    assert (rb["boot_hi"] - rb["boot_lo"]) < (rs["boot_hi"] - rs["boot_lo"]) / 2


def test_bootstrap_ci_deterministic(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "event_id long, value double"
    )
    a = evalmetrics.bootstrap_mean_ci(df, F.col("value"), F.col("event_id")).collect()[0]
    b = evalmetrics.bootstrap_mean_ci(df, F.col("value"), F.col("event_id")).collect()[0]
    assert (a["boot_lo"], a["boot_hi"]) == (b["boot_lo"], b["boot_hi"])


def test_permutation_test_detects_and_rejects(spark):
    from kafka_connect_morphlines_spark.functions import evalmetrics

    # strong signal: arms differ by 10 -> tiny p
    strong = spark.createDataFrame(
        [(i, "a", 10.0 + (i % 3)) for i in range(60)]
        + [(i + 100, "b", 0.0 + (i % 3)) for i in range(60)],
        "event_id long, g string, v double",
    )
    r = evalmetrics.permutation_test_diff(
        strong, F.col("v"), F.col("g"), "a", "b", id_col=F.col("event_id"), b=200
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (60, 60)
    assert r["diff"] == 10.0
    assert r["p_value"] == round(1 / 201, 6)  # no relabeling reaches |10|
    # null case: identical distributions -> p far from 0
    null = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i % 7)) for i in range(200)],
        "event_id long, g string, v double",
    )
    rn = evalmetrics.permutation_test_diff(
        null, F.col("v"), F.col("g"), "a", "b", id_col=F.col("event_id"), b=200
    ).collect()[0]
    assert rn["p_value"] > 0.05


def test_permutation_test_unbalanced_null_calibration(spark):
    """Null calibration with strongly unbalanced arms (30 vs 300): an
    unconditioned 50/50 relabeling coin makes every replicate compare two
    ~165-row pseudo-arms, whose diff variance (~4*sigma^2/330) is far
    below the observed-split variance sigma^2*(1/30+1/300) — so under H0
    the replicate diffs are systematically too small and p collapses
    toward 1/(b+1).  The observed-split-conditioned coin must keep the
    null p-value honest."""
    from kafka_connect_morphlines_spark.functions import evalmetrics

    rows = [(i, "a" if i % 11 == 0 else "b", float((i * 7) % 13)) for i in range(330)]
    null = spark.createDataFrame(rows, "event_id long, g string, v double")
    r = evalmetrics.permutation_test_diff(
        null, F.col("v"), F.col("g"), "a", "b", id_col=F.col("event_id"), b=200
    ).collect()[0]
    assert (r["n_a"], r["n_b"]) == (30, 300)
    # H0 holds (same deterministic value distribution in both arms):
    # a calibrated test must NOT report significance.
    assert r["p_value"] > 0.05
    # Replicate arm sizes must track the observed split, not 50/50: with
    # p_a = 30/330 the pseudo-arm-a mean size is ~30; a 50/50 coin would
    # put ~165 rows in arm a and shrink every replicate diff.  Recompute
    # one replicate's coin assignments to pin the conditioning.
    from pyspark.sql import functions as F2

    base = null.select(
        F2.col("event_id").alias("_id"), F2.lit(30).alias("n_a"), F2.lit(300).alias("n_b")
    )
    u16 = F2.conv(F2.substring(F2.md5(F2.concat(F2.lit("perm/0/"), F2.col("_id").cast("string"))), 1, 4), 16, 10).cast("long")
    n_a_rep0 = base.select(
        F2.sum(F2.when(u16 * 330 < 30 * 65536, 1).otherwise(0)).alias("na")
    ).collect()[0]["na"]
    assert 10 <= n_a_rep0 <= 60  # binomial(330, ~0.0909): mean 30, sd ~5.2
